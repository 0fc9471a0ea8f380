"""Offline pose-tracking evaluation CLI.

Parity: JRDB_toolkit/posetrack/eval_pose.py — HOTA / CLEAR / Identity /
OSPA2 over tracked pose predictions (metric implementations in
eval/tracking.py).
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    from ..eval.tracking import evaluate_tracking
    p = argparse.ArgumentParser()
    p.add_argument("--gt", required=True, help="COCO-video GT json")
    p.add_argument("--pred", required=True,
                   help="predictions json (list or COCO dict w/ track_id)")
    p.add_argument("--out", default=None)
    a = p.parse_args(argv)
    res = evaluate_tracking(a.gt, a.pred)
    for k, v in res.items():
        print(f"{k:12s} {v:.4f}" if isinstance(v, float) else f"{k:12s} {v}")
    if a.out:
        with open(a.out, "w") as f:
            json.dump(res, f, indent=2)


if __name__ == "__main__":
    main()
