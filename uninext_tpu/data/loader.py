"""Multi-dataset weighted loader with static-shape bucketing.

Parity anchors (reference data/custom_dataset_dataloader.py):
  * MultiDatasetSampler            — :195-265 (weighted multinomial over
    datasets via DATASET_RATIO, rank-strided infinite stream)
  * DIFFMDAspectRatioGroupedDataset— :288 (grouped batching by (dataset,
    aspect), per-dataset batch sizes)

TPU re-design: grouping is by (dataset, padded bucket shape) so every emitted
batch maps to exactly one compiled executable; the sampler is an infinite
generator sharded per host (jax.process_index) instead of per-GPU rank.
Workers: a thread pool keeps the host pipeline ahead of the device.
"""
from __future__ import annotations

import random
import threading
import queue
from typing import Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np

from .coco import MappedSample


def collate(samples: Sequence[MappedSample]) -> Dict[str, np.ndarray]:
    """Stack same-bucket samples into one batch dict (model contract)."""
    batch = {
        "images": np.stack([s.image for s in samples]),
        "img_mask": np.stack([s.img_mask for s in samples]),
        "image_sizes": np.stack([s.image_size for s in samples]),
        "text_ids": np.stack([s.text_ids for s in samples]),
        "text_mask": np.stack([s.text_mask for s in samples]),
        "targets": {
            "boxes": np.stack([s.boxes for s in samples]),
            "valid": np.stack([s.valid for s in samples]),
            "positive_map": np.stack([s.positive_map for s in samples]),
        },
    }
    if samples[0].masks is not None:
        # NOTE: has_masks stays OUT of the pytree (it is a static argument of
        # make_train_step); presence of the "masks" key is the host-side signal
        batch["targets"]["masks"] = np.stack([s.masks for s in samples])
    return batch


class MultiDatasetLoader:
    """Infinite stream of collated batches.

    datasets: list of (records, mapper, batch_size[, task]); ratios:
    sampling weights. With the optional 4th element, emitted batches carry
    a host-side "__task__" key so a joint-stage trainer can route each batch
    to the matching train step (detection / grounding / sot) — the
    reference's dataset_source dispatch (uninext_vid.py:256-300).
    """

    def __init__(self, datasets: List[tuple], ratios: Sequence[float],
                 seed: int = 0, num_workers: int = 4,
                 process_index: int = 0, process_count: int = 1,
                 buckets_per_group: int = 32):
        self.datasets = datasets
        self.ratios = np.asarray(ratios, np.float64)
        self.ratios /= self.ratios.sum()
        self.seed = seed
        self.num_workers = num_workers
        self.process_index = process_index
        self.process_count = process_count

    def _sample_records(self) -> Iterator[tuple]:
        rng = random.Random(self.seed + self.process_index)
        orders = [list(range(len(ds[0]))) for ds in self.datasets]
        cursors = [len(o) for o in orders]  # trigger shuffle on first use
        i = 0
        while True:
            d = rng.choices(range(len(self.datasets)), weights=self.ratios)[0]
            if i % self.process_count == self.process_index:
                if cursors[d] >= len(orders[d]):
                    rng.shuffle(orders[d])
                    cursors[d] = 0
                yield d, self.datasets[d][0][orders[d][cursors[d]]]
                cursors[d] += 1
            else:
                cursors[d] = (cursors[d] + 1) % max(len(orders[d]), 1)
            i += 1

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        # map records on a thread pool (the reference uses worker processes;
        # PIL decode + numpy release the GIL so threads overlap fine), then
        # group by (dataset, bucket) and flush full batches
        from concurrent.futures import ThreadPoolExecutor

        def mapped():
            rec_iter = self._sample_records()
            with ThreadPoolExecutor(max_workers=max(self.num_workers, 1)) as ex:
                pending = []
                for d, record in rec_iter:
                    seed = random.Random(self.seed ^ hash((d, id(record))))
                    pending.append((d, ex.submit(self.datasets[d][1], record,
                                                 seed)))
                    if len(pending) >= 2 * self.num_workers + 1:
                        d0, fut = pending.pop(0)
                        yield d0, fut.result()
                for d0, fut in pending:
                    yield d0, fut.result()

        groups: Dict[tuple, List[MappedSample]] = {}
        for d, sample in mapped():
            # video mappers emit (key, ref) MappedSample pairs; bucket by the
            # key frame (clip-consistent aug gives both frames one bucket)
            is_pair = isinstance(sample, tuple)
            key = (d, (sample[0] if is_pair else sample).bucket)
            groups.setdefault(key, []).append(sample)
            if len(groups[key]) == self.datasets[d][2]:
                batch = groups.pop(key)
                if is_pair:
                    from .video import collate_video
                    out = collate_video(batch)
                else:
                    out = collate(batch)
                if len(self.datasets[d]) > 3:
                    out["__task__"] = self.datasets[d][3]
                yield out


def prefetch(iterator: Iterator, size: int = 2) -> Iterator:
    """Background-thread prefetch so host mapping overlaps device compute."""
    q: queue.Queue = queue.Queue(maxsize=size)
    sentinel = object()

    def worker():
        for item in iterator:
            q.put(item)
        q.put(sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        yield item
