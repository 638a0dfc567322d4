"""run_eval_patch.py — patch-classifier evaluation harness.

Usage:
  run_eval_patch.py [--gpu=<id>] [--model=<path>] [--batch_size=<n>] \
                    [--input_dir=<path>] [--patch_input_shape=<n>]
  run_eval_patch.py (-h | --help)

Options:
  -h --help                 Show this string.
  --gpu=<id>                Accepted for compatibility. [default: 0]
  --model=<path>            Path to model directory (weights.tar + settings.yml).
  --batch_size=<n>          Batch size. [default: 32]
  --input_dir=<path>        Directory of joblib .dat patch files ({"img", "ann"}).
  --patch_input_shape=<n>   Center-crop size fed to the network. [default: 144]

The reference's patch evaluation (infer/patch.py) is bit-rotted and has no
CLI; this completes it (prints per-class AP / accuracy / F1 and the
normalized confusion matrix).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cerberus_tpu.config import load_settings
from cerberus_tpu.utils.cli import docopt
from cerberus_tpu.utils.debug import configure_from_env

configure_from_env()

if __name__ == "__main__":
    args = docopt(__doc__)

    run_root_dir = args["--model"]
    checkpoint_path = "%s/weights.tar" % run_root_dir
    paramset = load_settings(run_root_dir)

    from cerberus_tpu.infer.patch import InferManager

    infer = InferManager(
        checkpoint_path=checkpoint_path,
        decoder_dict=paramset.req_target_code,
        model_args=paramset.model_kwargs,
    )
    infer.process_file_list({
        "input_dir": args["--input_dir"],
        "batch_size": int(args["--batch_size"]),
        "patch_input_shape": int(args["--patch_input_shape"]),
    })
