"""Select the best checkpoint by metric constraints.

Re-design of `/root/reference/tools/select_model.py:13-64` over this
framework's ``.npz`` checkpoints: scan a directory tree for checkpoints,
filter with ``name<op>value`` constraints on stored metrics, and copy the
best (by the --metric key) to ``model.npz``.
"""

import argparse
import glob
import operator
import os
import re
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vsrd_tpu.utils.saver import load_checkpoint  # noqa: E402

OPERATORS = {
    "<=": operator.le,
    ">=": operator.ge,
    "<": operator.lt,
    ">": operator.gt,
    "==": operator.eq,
}


def parse_constraint(text):
    match = re.fullmatch(r"([\w/]+)(<=|>=|<|>|==)([-\d.eE]+)", text)
    if not match:
        raise ValueError(f"bad constraint: {text!r}")
    name, op, value = match.groups()
    return name, OPERATORS[op], float(value)


def main(args):
    constraints = [parse_constraint(c) for c in args.constraints]
    candidates = []
    for filename in sorted(
        glob.glob(os.path.join(args.ckpt_dirname, "**", "*.npz"), recursive=True)
    ):
        try:
            checkpoint = load_checkpoint(filename)
        except Exception:
            continue
        metrics = checkpoint.get("metrics", {})
        values = {k: float(v) for k, v in metrics.items()} if metrics else {}
        if not all(
            name in values and op(values[name], threshold)
            for name, op, threshold in constraints
        ):
            continue
        score = values.get(args.metric)
        if score is None:
            continue
        candidates.append((score, filename))

    if not candidates:
        print("no checkpoint satisfies the constraints")
        return

    best = max(candidates) if args.maximize else min(candidates)
    target = os.path.join(args.ckpt_dirname, "model.npz")
    shutil.copy(best[1], target)
    print(f"selected {best[1]} ({args.metric}={best[0]:.4f}) -> {target}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="vsrd_tpu: checkpoint selector")
    parser.add_argument("--ckpt_dirname", type=str, required=True)
    parser.add_argument("--metric", type=str, default="iou_3d")
    parser.add_argument("--maximize", action="store_true", default=True)
    parser.add_argument("--constraints", type=str, nargs="*", default=[])
    main(parser.parse_args())
