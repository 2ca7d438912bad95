"""Split a cached predictions.pkl into per-image pickles keyed by image id
(reference tools/split_predictions.py:9-36 — the stage-handoff format for
SOLVER.OFFLINE_2D_PREDICTIONS)."""
from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--predictions", required=True)
    p.add_argument("--out", required=True)
    args = p.parse_args()

    with open(args.predictions, "rb") as f:
        predictions = pickle.load(f)
    os.makedirs(args.out, exist_ok=True)
    for imgid, pred in predictions.items():
        with open(os.path.join(args.out, f"{imgid}.pkl"), "wb") as f:
            pickle.dump(pred, f)
    print(f"split {len(predictions)} predictions into {args.out}")


if __name__ == "__main__":
    main()
