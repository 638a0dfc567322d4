"""run_infer_wsi.py

Usage:
  run_infer_wsi.py [--gpu=<id>] [--model=<path>] [--nr_inference_workers=<n>] \
            [--nr_post_proc_workers=<n>] [--batch_size=<n>] [--tile_shape=<n>] [--chunk_shape=<n>] \
            [--ambiguous_size=<int>] [--wsi_proc_mag=<n>] [--wsi_file_ext=<str>] [--cache_path=<path>] \
            [--logging_dir=<path>] [--input_dir=<path>] [--msk_dir=<path>] [--output_dir=<path>] [--patch_input_shape=<n>] \
            [--patch_output_shape=<n>] [--wsi_bulk_idx=<n>] [--wsi_proc_step=<n>] [--save_thumb] [--save_mask] [--auto_mask] \
            [--postproc_backend=<str>] [--save_json] [--dense]
  run_infer_wsi.py (-h | --help)
  run_infer_wsi.py --version

Options:
  -h --help                   Show this string.
  --version                   Show version.
  --gpu=<id>                  GPU list. [default: 0]
  --model=<path>              Path to saved checkpoint.
  --nr_inference_workers=<n>  Number of workers during inference. [default: 0]
  --nr_post_proc_workers=<n>  Number of workers during post-processing. [default: 0]
  --batch_size=<n>            Batch size. [default: 30]
  --tile_shape=<n>            Shape of tile for processing. [default: 2048]
  --chunk_shape=<n>           Shape of tile for processing. [default: 15000]
  --ambiguous_size=<int>      Define ambiguous region along tiling grid to perform re-post processing. [default: 64]
  --wsi_proc_mag=<n>          Microns per pixel used for WSI processing. [default: 0.5]
  --wsi_file_ext=<str>        File extension of WSIs to process. [default: .svs]
  --cache_path=<path>         Path for cache. Should be placed on SSD with at least 100GB. [default: cache/]
  --logging_dir=<path>        Path for python logging. [default: logging/]
  --input_dir=<path>          Path to input data directory. Assumes the files are not nested within directory.
  --msk_dir=<path>            Path to directory containing tissue masks. Should have the same name as corresponding WSIs.
  --output_dir=<path>         Path to output data directory. Will create automtically if doesn't exist. [default: output/]
  --patch_input_shape=<n>     Shape of input patch to the network- Assume square shape. [default: 448]
  --patch_output_shape=<n>    Shape of network output- Assume square shape. [default: 144]
  --dense                     Dense inference: 1168->864 windows (~3x fewer FLOPs per output px at the same 152 px margin; PARITY.md). Overrides the patch shape flags; use --batch_size=16 or less (windows are 6.8x larger; 16 fits 16 GB HBM)
  --wsi_bulk_idx=<n>          Index for batch processing. Indexing is from 0 to n-1. [default: 1]
  --wsi_proc_step=<n>         Increments for batch WSI processing. [default: 10]
  --save_thumb                Whether to save the slide thumbnail
  --save_mask                 Whether to save the slide mask
  --auto_mask                 Generate tissue masks automatically (stain-entropy Otsu) for slides without one
  --postproc_backend=<str>    Instance post-processing backend: cpu or tpu (on-chip kernels). [default: cpu]
  --save_json                 Also export per-slide instance dictionaries as json/<name>.json

Flag surface is bit-for-bit the reference CLI (run_infer_wsi.py:1-37),
including the bulk-sharding contract: slides [(bulk_idx-1)*step, bulk_idx*step)
are processed per invocation, the cache path is suffixed with the bulk index,
and WSIs lacking a mask are skipped when --msk_dir is given.
"""
import glob
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
    logging_dir = args["--logging_dir"]
    cache_path = args["--cache_path"] + args["--wsi_bulk_idx"]
    wsi_file_ext = args["--wsi_file_ext"]

    if not os.path.exists(output_dir):
        rm_n_mkdir(output_dir)
    if not os.path.exists(logging_dir):
        rm_n_mkdir(logging_dir)

    wsi_file_list = glob.glob(f"{input_dir}/*{wsi_file_ext}")
    # .npy pyramid directories are also slides in this framework
    wsi_file_list += [p for p in glob.glob(f"{input_dir}/*")
                      if os.path.isdir(p)
                      and os.path.exists(os.path.join(p, "level_0.npy"))]
    wsi_file_list = sorted(set(wsi_file_list))

    wsi_list, mask_list = [], []
    for wsi_filename in wsi_file_list:
        # deliberate divergence (PARITY.md): the reference strips a FIXED
        # five characters (basename[:-5], run_infer_wsi.py:76-77 — correct
        # only for .tiff); splitext handles every extension, so mask files
        # pair with .svs/.npy-dir slides too
        wsi_basename = os.path.splitext(os.path.basename(wsi_filename))[0]
        if not args["--msk_dir"]:
            wsi_list.append(wsi_filename)
            mask_list.append(None)
        elif os.path.isfile(args["--msk_dir"] + wsi_basename + ".png"):
            wsi_list.append(wsi_filename)
            mask_list.append(args["--msk_dir"] + wsi_basename + ".png")

    # bulk sharding for embarrassingly-parallel multi-machine runs
    step = int(args["--wsi_proc_step"])
    start_idx = (int(args["--wsi_bulk_idx"]) - 1) * step
    end_idx = int(args["--wsi_bulk_idx"]) * step
    wsi_list = wsi_list[start_idx:end_idx]
    mask_list = mask_list[start_idx:end_idx]

    print("Number of WSIs in list:", len(wsi_list))

    run_root_dir = args["--model"]
    checkpoint_path = "%s/weights.tar" % run_root_dir
    paramset = load_settings(run_root_dir)

    run_args = {
        "nr_inference_workers": int(args["--nr_inference_workers"]),
        "nr_post_proc_workers": int(args["--nr_post_proc_workers"]),
        "batch_size": int(args["--batch_size"]),
        "input_list": wsi_list,
        "mask_list": mask_list,
        "output_dir": output_dir,
        "patch_input_shape": 1168 if args["--dense"]
        else int(args["--patch_input_shape"]),
        "patch_output_shape": 864 if args["--dense"]
        else int(args["--patch_output_shape"]),
        "save_thumb": bool(args["--save_thumb"]),
        "save_mask": bool(args["--save_mask"]),
        "postproc_list": list(DEFAULT_TARGET_LIST),
        "tile_shape": int(args["--tile_shape"]),
        "chunk_shape": int(args["--chunk_shape"]),
        "ambiguous_size": int(args["--ambiguous_size"]),
        "cache_path": cache_path,
        "logging_dir": logging_dir,
        "wsi_proc_mag": float(args["--wsi_proc_mag"]),
        "auto_mask": bool(args["--auto_mask"]),
        "postproc_backend": args["--postproc_backend"],
        "save_json": bool(args["--save_json"]),
    }

    from cerberus_tpu.infer.wsi import InferManager

    # mesh='auto': batch-shard across all visible chips (the reference's
    # DataParallel-over-visible-GPUs behavior); no-op on a single chip
    infer = InferManager(
        checkpoint_path=checkpoint_path,
        decoder_dict=paramset.req_target_code,
        model_args=paramset.model_kwargs,
        mesh="auto",
    )
    infer.process_wsi_list(run_args)
