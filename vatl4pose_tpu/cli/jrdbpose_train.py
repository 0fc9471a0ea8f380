"""JRDB-Pose estimator pre-training (parity: scripts/jrdbpose_train.py).

Identical machinery to posetrack_train with JRDB configs (dataset TYPE
'JRDB2022', different joint pairs / id scheme handled by the data layer).
"""

from __future__ import annotations

from .posetrack_train import main as _main


def main(argv=None):
    return _main(argv)


if __name__ == "__main__":
    main()
