#!/usr/bin/env python
"""Dataset filename normalizer — the role of renamer.sh (which strips
``masked_`` prefixes and collapses doubled ``_hdN_hdN`` suffixes with the
perl `rename` utility).  Config-driven instead of hardcoded:

    python scripts/rename_dataset.py DIR --strip-prefix masked_ \
        --dedupe-suffix _hd1 _hd2 _hd3 _hd4 [--apply]

Dry-run by default; --apply performs the renames.
"""

from __future__ import annotations

import argparse
import os


def plan(root: str, strip_prefix: str | None,
         dedupe_suffixes: list[str]) -> list[tuple[str, str]]:
    existing = set(os.listdir(root))
    out = []
    targets: dict[str, str] = {}
    planned_sources: set[str] = set()
    for name in sorted(existing):
        new = name
        if strip_prefix and new.startswith(strip_prefix):
            new = new[len(strip_prefix):]
        for suf in dedupe_suffixes:
            doubled = suf + suf
            if doubled in new:
                new = new.replace(doubled, suf)
        if new == name:
            continue
        # POSIX os.rename silently REPLACES an existing target — refuse any
        # plan that would clobber a file or map two sources to one target.
        if new in existing and new not in planned_sources:
            raise SystemExit(
                f"refusing: {name} -> {new} would overwrite an existing file")
        if new in targets:
            raise SystemExit(
                f"refusing: both {targets[new]} and {name} map to {new}")
        targets[new] = name
        planned_sources.add(name)
        out.append((name, new))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("dir")
    ap.add_argument("--strip-prefix", default=None)
    ap.add_argument("--dedupe-suffix", nargs="*", default=[])
    ap.add_argument("--apply", action="store_true")
    args = ap.parse_args()

    renames = plan(args.dir, args.strip_prefix, args.dedupe_suffix)
    for old, new in renames:
        print(f"{old} -> {new}")
        if args.apply:
            os.rename(os.path.join(args.dir, old), os.path.join(args.dir, new))
    print(f"{'renamed' if args.apply else 'would rename'} {len(renames)} files")


if __name__ == "__main__":
    main()
