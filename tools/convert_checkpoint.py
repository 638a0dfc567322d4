"""convert_checkpoint.py — one-shot reference-checkpoint conversion.

Usage:
  convert_checkpoint.py <torch_tar> <output_path>
  convert_checkpoint.py (-h | --help)

Converts a reference ``weights.tar`` (torch ``{"desc": state_dict}``, with or
without DataParallel prefixes) to the native msgpack tree. The runtime also
converts on the fly (models/convert.load_checkpoint), so this tool just
removes the torch import from the serving path.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cerberus_tpu.models.convert import convert_torch_checkpoint, save_checkpoint

if __name__ == "__main__":
    argv = sys.argv[1:]
    if not argv or argv[0] in ("-h", "--help") or len(argv) != 2:
        print(__doc__)
        sys.exit(0 if argv and argv[0] in ("-h", "--help") else 1)
    src, dst = argv
    params = convert_torch_checkpoint(src)
    save_checkpoint(dst, params)
    n = sum(v.size for leaf in params.values() for v in leaf.values())
    print(f"converted {src} -> {dst} ({len(params)} layers, {n:,} params)")
