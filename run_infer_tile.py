"""run_infer_tile.py

Usage:
  run_infer_tile.py [--gpu=<id>] [--model=<path>] [--nr_inference_workers=<n>] \
            [--nr_post_proc_workers=<n>] [--batch_size=<n>] [--input_dir=<path>] \
            [--output_dir=<path>] [--patch_input_shape=<n>] [--patch_output_shape=<n>] \
            [--postproc_backend=<str>] [--tile_backend=<str>] [--dense]
  run_infer_tile.py (-h | --help)
  run_infer_tile.py --version

Options:
  -h --help                   Show this string.
  --version                   Show version.
  --gpu=<id>                  GPU list. [default: 0]
  --model=<path>              Path to saved checkpoint.
  --nr_inference_workers=<n>  Number of workers during inference. [default: 0]
  --nr_post_proc_workers=<n>  Number of workers during post-processing. [default: 0]
  --batch_size=<n>            Batch size. [default: 10]
  --input_dir=<path>          Path to input data directory. Assumes the files are not nested within directory.
  --output_dir=<path>         Path to output data directory. Will create automtically if doesn't exist. [default: output/]
  --patch_input_shape=<n>     Shape of input patch to the network- Assume square shape. [default: 448]
  --patch_output_shape=<n>    Shape of network output- Assume square shape. [default: 144]
  --dense                     Dense inference: 1168->864 windows (~3x fewer FLOPs per output px at the same 152 px margin; PARITY.md). Overrides the patch shape flags; use --batch_size=16 or less (windows are 6.8x larger; 16 fits 16 GB HBM)
  --postproc_backend=<str>    Instance post-processing backend: cpu (scipy/cv2 oracle) or tpu (on-chip lax/Pallas kernels). [default: cpu]
  --tile_backend=<str>        Tile engine: host (gather + stitch on host) or fused (forward + canvas scatter as one on-device program). [default: host]

Flag surface is bit-for-bit the reference CLI (run_infer_tile.py:1-23). The
``--gpu`` flag is accepted for drop-in compatibility; device selection on TPU
is XLA's (all visible chips are used via batch sharding).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cerberus_tpu.config import DEFAULT_TARGET_LIST, load_settings
from cerberus_tpu.utils import rm_n_mkdir
from cerberus_tpu.utils.cli import docopt
from cerberus_tpu.utils.debug import configure_from_env

configure_from_env()

if __name__ == "__main__":
    args = docopt(__doc__, version="CoBi Gland Inference (cerberus-tpu)")

    input_dir = args["--input_dir"]
    output_dir = args["--output_dir"]
    if not os.path.exists(output_dir):
        rm_n_mkdir(output_dir)

    run_root_dir = args["--model"]
    checkpoint_path = "%s/weights.tar" % run_root_dir
    paramset = load_settings(run_root_dir)

    run_args = {
        "nr_inference_workers": int(args["--nr_inference_workers"]),
        "nr_post_proc_workers": int(args["--nr_post_proc_workers"]),
        "batch_size": int(args["--batch_size"]),
        "input_dir": input_dir,
        "output_dir": output_dir,
        "patch_input_shape": 1168 if args["--dense"]
        else int(args["--patch_input_shape"]),
        "patch_output_shape": 864 if args["--dense"]
        else int(args["--patch_output_shape"]),
        "patch_output_overlap": 0,
        "postproc_list": list(DEFAULT_TARGET_LIST),
        "postproc_backend": args["--postproc_backend"],
        "tile_backend": args["--tile_backend"],
    }

    from cerberus_tpu.infer.tile import InferManager

    # mesh='auto': batch-shard across all visible chips (the reference's
    # DataParallel-over-visible-GPUs behavior); no-op on a single chip
    infer = InferManager(
        checkpoint_path=checkpoint_path,
        decoder_dict=paramset.req_target_code,
        model_args=paramset.model_kwargs,
        mesh="auto",
    )
    infer.process_file_list(run_args)
