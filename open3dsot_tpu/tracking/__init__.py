"""Tracking/eval paths: host fidelity loop (eval.py), batched on-device
scan trackers (scan_tracker.py, scan_matching.py), and the online serving
API (online.py)."""

from open3dsot_tpu.tracking.online import (  # noqa: F401
    OnlineM2Tracker,
    OnlineMatchTracker,
    make_online_tracker,
)
from open3dsot_tpu.tracking.serving_export import (  # noqa: F401
    load_serving_bundle,
    save_serving_bundle,
)
from open3dsot_tpu.tracking.scan_matching import (  # noqa: F401
    MatchScanTracker,
    evaluate_dataset_scan_matching,
)
from open3dsot_tpu.tracking.scan_tracker import (  # noqa: F401
    M2ScanTracker,
    evaluate_dataset_scan,
)
