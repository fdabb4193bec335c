"""Batch-rename checkpoint epochs in a save_model directory
(parity with reference scripts/rename.py: shift checkpoint numbers)."""

import argparse
import os
import re

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("dir", help="model dir, e.g. save_model/battle-l")
    parser.add_argument("--offset", type=int, required=True,
                        help="added to every epoch number")
    parser.add_argument("--dry", action="store_true")
    args = parser.parse_args()

    pattern = re.compile(r"^(.*)_(\d+)\.npz$")
    renames = []
    for name in sorted(os.listdir(args.dir)):
        m = pattern.match(name)
        if m:
            new = "%s_%d.npz" % (m.group(1), int(m.group(2)) + args.offset)
            renames.append((int(m.group(2)), name, new))
    # process in an order where a rename can never clobber a yet-unrenamed
    # file: descending epochs for positive offsets, ascending for negative
    renames.sort(key=lambda r: r[0], reverse=args.offset > 0)
    renames = [(old, new) for _, old, new in renames]
    for old, new in renames:
        print("%s -> %s" % (old, new))
        if not args.dry:
            os.rename(os.path.join(args.dir, old), os.path.join(args.dir, new))
    print("%d files %s" % (len(renames), "would be renamed" if args.dry else "renamed"))
