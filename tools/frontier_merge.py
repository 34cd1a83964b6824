#!/usr/bin/env python
"""Merge frontier halves (TPU FPS + possibly-CPU AP), compute paired
deltas + the promoted protocol, and render the docs/PERF.md table.

The round-5 runs split naturally: FPS must run on the chip; the paired-AP
half is device-agnostic (same checkpoint, deterministic eval) and was
hedged on CPU while the tunnel crawled. This tool reconciles whichever
halves exist into ONE FRONTIER.json with the same schema
tools/frontier_sweep.py writes, and prints the markdown table.

Usage: python tools/frontier_merge.py [--fps FRONTIER.json]
         [--ap FRONTIER_cpu.json] [--out FRONTIER.json]
"""
import argparse
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fps", default=os.path.join(REPO, "FRONTIER.json"))
    ap.add_argument("--ap", default=os.path.join(REPO, "FRONTIER_cpu.json"))
    ap.add_argument("--out", default=os.path.join(REPO, "FRONTIER.json"))
    args = ap.parse_args()

    with open(args.fps) as f:
        fps = json.load(f)
    merged = dict(fps)
    protos = merged.get("protocols", {})
    if os.path.exists(args.ap):
        with open(args.ap) as f:
            apd = json.load(f)
        for name, v in apd.get("protocols", {}).items():
            dst = protos.setdefault(name, {})
            # protocol identity: fill only if absent (FPS half is source
            # of truth); measurements: AP half always wins
            for k in ("num_queries", "enc_points", "dec_points",
                      "res_scale"):
                if v.get(k) is not None:
                    dst.setdefault(k, v[k])
            for k in ("ap_bbox", "ap50_bbox", "ap_segm",
                      "fixture_eval_res"):
                if v.get(k) is not None:
                    dst[k] = v[k]
        merged["ap_source"] = {"file": os.path.basename(args.ap),
                               "device": apd.get("device"),
                               "train_steps": apd.get("train_steps")}

    base = protos.get("base_900q_p44_800px", {})
    if base.get("ap_bbox") is not None:
        for v in protos.values():
            if v.get("ap_bbox") is not None:
                v["ap_delta_vs_base"] = round(v["ap_bbox"] - base["ap_bbox"],
                                              4)
    cands = [(k, v) for k, v in protos.items()
             if v.get("fps_det") and v.get("ap_delta_vs_base") is not None
             and v["ap_delta_vs_base"] >= -0.015]
    if cands:
        k, v = max(cands, key=lambda kv: kv[1]["fps_det"])
        merged["promoted"] = {"name": k, **v}
    merged["partial"] = False
    with open(args.out, "w") as f:
        json.dump(merged, f, indent=1)

    # markdown table
    print("| protocol | Q | enc/dec pts | res | FPS | x base | AP (fixture)"
          " | dAP |")
    print("|---|---|---|---|---|---|---|---|")
    for name, v in protos.items():
        print(f"| {name} | {v.get('num_queries')} "
              f"| {v.get('enc_points')}/{v.get('dec_points')} "
              f"| {v.get('res_scale')} | {v.get('fps_det', '—')} "
              f"| {v.get('speedup_vs_base_protocol', '—')} "
              f"| {v.get('ap_bbox', '—')} "
              f"| {v.get('ap_delta_vs_base', '—')} |")
    if merged.get("promoted"):
        print(f"\npromoted: {merged['promoted']['name']}")
    print(f"[done] wrote {args.out}")


if __name__ == "__main__":
    main()
