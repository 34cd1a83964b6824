from .detr import UninextDETR, feature_shapes  # noqa: F401
from .trackers import IDOLTracker, QuasiDenseTracker  # noqa: F401
