"""run_train.py — multi-task training launcher.

Usage:
  run_train.py [--gpu=<id>] [--settings=<path>] [--log_dir=<path>] \
               [--nr_epochs=<n>] [--batch_size=<n>] [--seed=<n>] \
               [--pretrained=<path>] [--pretrained_fold=<n>] \
               [--pretrained_tag=<str>] [--per_n_steps=<n>] \
               [--resume=<path>] [--bf16] [--remat=<stage>] \
               [--grad_accum=<k>] [--paired]
  run_train.py (-h | --help)

Options:
  -h --help            Show this string.
  --gpu=<id>           Accepted for CLI compatibility; TPU devices are managed by XLA. [default: 0]
  --settings=<path>    Path to a settings.yml/paramset.yml (loader/optimizer/loss/dataset/model kwargs).
  --log_dir=<path>     Checkpoint + stats output directory. [default: logs/]
  --nr_epochs=<n>      Number of epochs. [default: 140]
  --batch_size=<n>     Batch size override. [default: 12]
  --seed=<n>           RNG seed. [default: 0]
  --pretrained=<path>  Checkpoint to initialize from: torch tar / native msgpack /
                       raw torchvision ImageNet state_dict (backbone-only; decoders
                       keep fresh init) / a pretrained.yml-style map (backbone ->
                       foldN -> tag -> path, the reference models/pretrained.yml
                       schema) resolved with --pretrained_fold/--pretrained_tag.
  --pretrained_fold=<n>  Fold entry when --pretrained is a yml map. [default: 1]
  --pretrained_tag=<str> Tag entry when --pretrained is a yml map. [default: imagenet_mtl]
  --per_n_steps=<n>    Logging/checkpoint/validation cadence in steps. [default: 2000]
  --resume=<path>      Resume a full training checkpoint (params + optimizer + step).
  --bf16               Mixed precision: bfloat16 activations for forward/backward;
                       params, optimizer moments, BN stats and loss reductions
                       stay float32 (TPU-native; no reference analog).
  --remat=<stage>      Activation rematerialization for large-batch training:
                       "all" checkpoints every stage, "backbone"/"towers" only
                       that stage class. "all" is what fits the reference-
                       default 448² batch 12 fp32 on a 16 GB chip; measured
                       matrix in BASELINE.md "Training-step". [default: off]
  --grad_accum=<k>     Gradient accumulation: split each batch into <k>
                       sequential microbatches inside one jitted step (grads
                       averaged, one Adam update, BN stats folded per
                       microbatch in order). batch_size must be divisible by
                       <k>. The path to the reference batch-32 config on one
                       16 GB chip (e.g. --batch_size=32 --grad_accum=4);
                       composes with --bf16/--remat and the mesh. [default: 1]
  --paired             Width-paired encoder front AND decoder-tower finest
                       levels in the training forward+backward
                       (models/paired_encoder.py, models/paired_tower.py) —
                       the inference TPU default's MXU-lane fix applied to
                       training: 1.42x device ms/step at b8/b32-accum bf16
                       (BASELINE.md). Divergence is conv-accumulation
                       reassociation only (PARITY.md). Requires a
                       basic-block resnet backbone and input width % 4 == 0.
                       Default keeps the bit-exact unpaired path.

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
from cerberus_tpu.utils.debug import configure_from_env

configure_from_env()

if __name__ == "__main__":
    args = docopt(__doc__)

    remat_arg = (args["--remat"] or "off").lower()
    if remat_arg not in ("off", "0", "false", "all", "true", "1",
                         "backbone", "towers"):
        raise SystemExit(f"--remat must be off/all/backbone/towers, "
                         f"got {remat_arg!r}")
    remat = (True if remat_arg in ("all", "true", "1")
             else remat_arg if remat_arg in ("backbone", "towers") else False)

    paramset = ParamSet.from_yaml(args["--settings"])
    log_dir = args["--log_dir"]
    mkdir(log_dir)

    from cerberus_tpu.train.opt import get_config, run_training

    config = get_config(
        paramset.model_kwargs,
        paramset.loss_kwargs,
        paramset.optimizer_kwargs,
        nr_epochs=int(args["--nr_epochs"]),
        per_n_steps=int(args["--per_n_steps"]),
    )
    if args["--resume"]:
        config["phase_list"][0]["run_info"]["net"]["resume_from"] = \
            args["--resume"]

    pretrained_params = None
    if args["--pretrained"]:
        from cerberus_tpu.models.convert import (
            load_checkpoint,
            resolve_pretrained_map,
        )

        pretrained_path = args["--pretrained"]
        if pretrained_path.endswith((".yml", ".yaml")):
            pretrained_path = resolve_pretrained_map(
                pretrained_path,
                paramset.model_kwargs["encoder_backbone_name"],
                args["--pretrained_fold"], args["--pretrained_tag"])
        pretrained_params = load_checkpoint(pretrained_path)

    # dataset plumbing: built-in MTLPatchDataset over train_dir/valid_dir in
    # dataset_kwargs, or a custom module exposing make_loaders(paramset, bs)
    dk = paramset.dataset_kwargs
    batch_size = int(args["--batch_size"])
    if dk.get("loader_module"):
        import importlib

        mod = importlib.import_module(dk["loader_module"])
        train_loaders, valid_loaders = mod.make_loaders(paramset, batch_size)
    elif dk.get("train_dir"):
        from cerberus_tpu.data.train_loader import MTLPatchDataset

        cfg = paramset.model_config
        common = dict(req_target_code=paramset.req_target_code,
                      input_shape=int(dk.get("input_shape", 448)),
                      output_shape=int(dk.get("output_shape", 448)),
                      batch_size=batch_size)
        train_loaders = {"train": MTLPatchDataset.from_dir(
            dk["train_dir"], cfg, **common)}
        # drop_last=False: validation must see every sample — with the
        # default True, a valid set smaller than the batch yields ZERO
        # batches and best-checkpoint selection silently breaks
        valid_loaders = {"valid": MTLPatchDataset.from_dir(
            dk.get("valid_dir", dk["train_dir"]), cfg, augment=False,
            shuffle=False, drop_last=False, **common)}
    else:
        raise SystemExit(
            "settings.yml dataset_kwargs must declare either train_dir "
            "(+ optional valid_dir) for the built-in MTLPatchDataset, or "
            "loader_module exposing make_loaders(paramset, batch_size)")

    compute_dtype = None
    if args["--bf16"]:
        import jax.numpy as jnp

        compute_dtype = jnp.bfloat16

    grad_accum = int(args["--grad_accum"])
    if grad_accum < 1 or batch_size % grad_accum:
        raise SystemExit(f"--batch_size={batch_size} must be a positive "
                         f"multiple of --grad_accum={grad_accum}")

    run_training(config, train_loaders, valid_loaders, log_dir=log_dir,
                 seed=int(args["--seed"]), pretrained_params=pretrained_params,
                 compute_dtype=compute_dtype, remat=remat,
                 grad_accum=grad_accum, paired=bool(args["--paired"]))
