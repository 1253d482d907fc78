"""Shard concatenation CLI (native csstore).

Replaces `scripts/mpc_data_collecting/cart_pole_nmpc/data_concatenate.py:20-63`
(a Python loop over torch.load/torch.cat): merges .css dataset shards written
by parallel collection jobs into one store, C++-side, zero Python copies.

  python scripts/concat_shards.py shard_*.css --out merged.css
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("shards", nargs="+")
    p.add_argument("--out", required=True)
    args = p.parse_args()

    from mpc_via_diffusion_model_tpu.native import concat_stores, read_store

    concat_stores(args.shards, args.out)
    merged = read_store(args.out)
    sizes = {k: list(v.shape) for k, v in merged.items()}
    print(f"merged {len(args.shards)} shards -> {args.out}: {sizes}")


if __name__ == "__main__":
    main()
