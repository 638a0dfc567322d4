"""run_train.py — multi-task training launcher.

Usage:
  run_train.py [--gpu=<id>] [--settings=<path>] [--log_dir=<path>] \
               [--nr_epochs=<n>] [--batch_size=<n>] [--seed=<n>] \
               [--pretrained=<path>]
  run_train.py (-h | --help)

Options:
  -h --help            Show this string.
  --gpu=<id>           Accepted for CLI compatibility; TPU devices are managed by XLA. [default: 0]
  --settings=<path>    Path to a settings.yml/paramset.yml (loader/optimizer/loss/dataset/model kwargs).
  --log_dir=<path>     Checkpoint + stats output directory. [default: logs/]
  --nr_epochs=<n>      Number of epochs. [default: 140]
  --batch_size=<n>     Batch size override. [default: 12]
  --seed=<n>           RNG seed. [default: 0]
  --pretrained=<path>  Checkpoint to initialize from (torch tar or native msgpack).

The reference ships a complete training engine with NO launcher
(SURVEY.md §1 — `run_utils/engine.py` has no caller in the repo); this CLI
completes the path: settings.yml -> get_config -> chained train/infer engines.
Dataset wiring expects a module exposing `make_loaders(paramset, batch_size)`
via --settings' `dataset_kwargs`; see cerberus_tpu/train/opt.py.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cerberus_tpu.config import ParamSet
from cerberus_tpu.utils import mkdir
from cerberus_tpu.utils.cli import docopt

if __name__ == "__main__":
    args = docopt(__doc__)

    paramset = ParamSet.from_yaml(args["--settings"])
    log_dir = args["--log_dir"]
    mkdir(log_dir)

    from cerberus_tpu.train.opt import get_config, run_training

    config = get_config(
        paramset.model_kwargs,
        paramset.loss_kwargs,
        paramset.optimizer_kwargs,
        nr_epochs=int(args["--nr_epochs"]),
    )

    pretrained_params = None
    if args["--pretrained"]:
        from cerberus_tpu.models.convert import load_checkpoint

        pretrained_params = load_checkpoint(args["--pretrained"])

    # dataset plumbing: a dataset module path in settings.yml dataset_kwargs
    # ('loader_module') must expose make_loaders(paramset, batch_size)
    loader_module = paramset.dataset_kwargs.get("loader_module")
    if loader_module is None:
        raise SystemExit(
            "settings.yml must declare dataset_kwargs.loader_module, a "
            "python module exposing make_loaders(paramset, batch_size) -> "
            "(train_loaders, valid_loaders)")
    import importlib

    mod = importlib.import_module(loader_module)
    train_loaders, valid_loaders = mod.make_loaders(
        paramset, int(args["--batch_size"]))

    run_training(config, train_loaders, valid_loaders, log_dir=log_dir,
                 seed=int(args["--seed"]), pretrained_params=pretrained_params)
