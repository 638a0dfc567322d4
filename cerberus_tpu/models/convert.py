"""Checkpoint conversion: reference ``weights.tar`` (torch) <-> native tree.

The reference checkpoint is a ``torch.save`` dict whose ``"desc"`` entry is
the NetDesc state_dict, possibly with a DataParallel ``module.`` prefix
(``infer/base.py:28-45``, ``run_utils/utils.py:11-25``). Because our
parameter tree reuses the torch module paths as flat keys, conversion is a
pure per-tensor transform:

  conv ``<name>.weight`` (O,I,H,W) -> ``params[<name>]["kernel"]`` (H,W,I,O)
  conv/BN ``<name>.bias``          -> ``params[<name>]["bias"]``
  BN ``<name>.weight``             -> ``params[<name>]["scale"]``
  BN ``<name>.running_mean/var``   -> ``params[<name>]["mean"/"var"]``
  ``num_batches_tracked``          -> dropped

Native checkpoints are msgpack files (flax.serialization) storing
``{"params": <flat tree>, "step": int}``.
"""
from __future__ import annotations

import os
from typing import Dict

import numpy as np

from flax import serialization


def strip_data_parallel_prefix(state_dict: Dict) -> Dict:
    names = list(state_dict.keys())
    if names and all(n.split(".")[0] == "module" for n in names):
        return {".".join(k.split(".")[1:]): v for k, v in state_dict.items()}
    return state_dict


def convert_torch_state_dict(state_dict: Dict) -> Dict:
    """torch state_dict (tensor or ndarray values) -> flat param tree."""
    state_dict = strip_data_parallel_prefix(state_dict)
    params: Dict[str, Dict[str, np.ndarray]] = {}
    for key, value in state_dict.items():
        value = np.asarray(
            value.detach().cpu().numpy() if hasattr(value, "detach") else value
        )
        leaf_name, attr = key.rsplit(".", 1)
        if attr == "num_batches_tracked":
            continue
        if attr == "basis_filters":
            # registered buffer of constant steerable basis filters — we
            # regenerate them at trace time (models/gconv.py), never stored
            continue
        leaf = params.setdefault(leaf_name, {})
        if attr == "weight":
            if value.ndim == 4:  # conv OIHW -> HWIO
                leaf["kernel"] = np.transpose(value, (2, 3, 1, 0)).copy()
            elif value.ndim == 1:  # norm scale
                leaf["scale"] = value.astype(np.float32)
            elif value.ndim == 8:  # steerable G-conv coefficients, kept as-is
                leaf["gweight"] = value.astype(np.float32)
            elif value.ndim == 2:  # linear: (O,I) -> (I,O)
                leaf["kernel"] = value.T.copy()
            else:
                raise ValueError(f"unrecognized weight rank for {key}")
        elif attr == "bias":
            leaf["bias"] = value.astype(np.float32)
        elif attr == "running_mean":
            leaf["mean"] = value.astype(np.float32)
        elif attr == "running_var":
            leaf["var"] = value.astype(np.float32)
        else:
            raise ValueError(f"unrecognized checkpoint entry: {key}")
    return params


_TORCHVISION_HEAD_PREFIXES = ("fc.", "classifier.")


def is_torchvision_backbone_state_dict(state_dict: Dict) -> bool:
    """A RAW torchvision ImageNet checkpoint (``conv1.weight``,
    ``layer1...``, ``features...``) rather than a NetDesc one (whose
    encoder keys live under ``backbone.``)."""
    keys = [k for k in state_dict]
    if not keys:
        return False
    stripped = [k[len("module."):] if k.startswith("module.") else k
                for k in keys]
    return (not any(k.startswith("backbone.") for k in stripped)
            and any(k.startswith(("conv1.", "features.", "layer1."))
                    for k in stripped))


def convert_torchvision_backbone(state_dict: Dict) -> Dict:
    """torchvision ImageNet state_dict -> ``backbone.*`` param subtree.

    The reference initializes its encoder from torchvision ImageNet
    weights (``models/backbone/resnet.py:19-29,292-297``, gated by
    ``backbone_imagenet_pretrained`` in ``models/net_desc.py:26,91``).
    Torchvision checkpoints use bare module paths and carry a classifier
    head (``fc.``/``classifier.``) the multi-task net doesn't have — drop
    the head, prefix with ``backbone.``, convert per-tensor. The result is
    a PARTIAL tree: overlay it on freshly-initialized params
    (``overlay_pretrained``)."""
    state_dict = strip_data_parallel_prefix(state_dict)
    return convert_torch_state_dict({
        f"backbone.{k}": v for k, v in state_dict.items()
        if not k.startswith(_TORCHVISION_HEAD_PREFIXES)})


def overlay_pretrained(init_params: Dict, pretrained: Dict) -> Dict:
    """Overlay a (possibly partial) pretrained tree on freshly-initialized
    params — the reference's ``backbone_imagenet_pretrained`` behavior:
    encoder weights from the checkpoint, decoders/heads keep their fresh
    init (``models/net_desc.py:82-100``). Keys absent from the model are
    skipped (a full-task checkpoint may feed a reduced-task config); shape
    mismatches on known keys raise."""
    out = dict(init_params)
    for key, leaf in pretrained.items():
        if key not in init_params:
            continue
        base = dict(init_params[key])
        for attr, value in leaf.items():
            if attr in base and tuple(np.shape(value)) != \
                    tuple(np.shape(base[attr])):
                raise ValueError(
                    f"pretrained {key}.{attr} shape {np.shape(value)} != "
                    f"model shape {np.shape(base[attr])}")
            base[attr] = value
        out[key] = base
    return out


def resolve_pretrained_map(map_path: str, backbone: str, fold,
                           tag: str = "imagenet_mtl") -> str:
    """Resolve a checkpoint path from a ``pretrained.yml``-style map
    (reference ``models/pretrained.yml``: backbone -> foldN -> tag ->
    path). Relative paths resolve against the yaml's directory."""
    import yaml

    with open(map_path) as handle:
        table = yaml.safe_load(handle)
    try:
        path = table[backbone][f"fold{int(fold)}"][tag]
    except (KeyError, TypeError) as exc:
        raise ValueError(
            f"{map_path}: no entry for backbone={backbone!r} "
            f"fold{fold}/{tag!r}") from exc
    if not os.path.isabs(path):
        path = os.path.join(os.path.dirname(os.path.abspath(map_path)), path)
    return path


def convert_torch_checkpoint(checkpoint_path: str) -> Dict:
    """Load a reference ``weights.tar`` and return the native param tree.
    Raw torchvision ImageNet checkpoints convert to a backbone-only
    subtree (see ``convert_torchvision_backbone``)."""
    import torch  # local import: torch only needed for legacy checkpoints

    ckpt = torch.load(checkpoint_path, map_location="cpu", weights_only=False)
    state_dict = ckpt["desc"] if isinstance(ckpt, dict) and "desc" in ckpt else ckpt
    if is_torchvision_backbone_state_dict(state_dict):
        return convert_torchvision_backbone(state_dict)
    return convert_torch_state_dict(state_dict)


def save_checkpoint(path: str, params: Dict, step: int = 0) -> None:
    blob = serialization.msgpack_serialize(
        {"params": {k: dict(v) for k, v in params.items()}, "step": np.int64(step)}
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as handle:
        handle.write(blob)
    os.replace(tmp, path)


def load_native_checkpoint(path: str) -> Dict:
    with open(path, "rb") as handle:
        tree = serialization.msgpack_restore(handle.read())
    return tree["params"]


def save_train_state(path: str, params: Dict, opt_state=None,
                     step: int = 0) -> None:
    """Full training checkpoint: params + optimizer state + step — the
    analog of the reference's ``{desc, optimizer, lr_scheduler}`` payload
    (run_utils/callbacks/base.py:122-128). The LR schedule is a pure
    function of ``step`` here, so step subsumes the scheduler state."""
    from flax.serialization import to_state_dict

    blob = serialization.msgpack_serialize({
        "params": {k: dict(v) for k, v in params.items()},
        "opt_state": to_state_dict(opt_state) if opt_state is not None else {},
        "step": np.int64(step),
    })
    tmp = path + ".tmp"
    with open(tmp, "wb") as handle:
        handle.write(blob)
    os.replace(tmp, path)


_ckpt_pool = None  # single worker: writes stay ordered
_ckpt_futures = []


def save_train_state_async(path: str, params: Dict, opt_state=None,
                           step: int = 0):
    """Non-blocking checkpoint write: the caller thread pays only the D2H
    snapshot (required — the next train step may donate and reuse these
    buffers); msgpack encode + disk write happen on a background thread.
    ``flush_pending_saves()`` joins outstanding writes and re-raises the
    first failure (call it at engine COMPLETED / process exit)."""
    global _ckpt_pool
    import jax

    params = jax.device_get(params)
    opt_state = jax.device_get(opt_state) if opt_state is not None else None
    if _ckpt_pool is None:
        from concurrent.futures import ThreadPoolExecutor

        _ckpt_pool = ThreadPoolExecutor(1, thread_name_prefix="ckpt_writer")
    fut = _ckpt_pool.submit(save_train_state, path, params, opt_state, step)
    _ckpt_futures.append(fut)
    return fut


def flush_pending_saves() -> None:
    """Wait for ALL in-flight async checkpoint writes (even after one
    fails — later writes must not be abandoned unchecked), then re-raise
    the first failure."""
    pending, _ckpt_futures[:] = _ckpt_futures[:], []
    first = None
    for fut in pending:
        try:
            fut.result()
        except BaseException as exc:  # noqa: BLE001 — reported below
            if first is None:
                first = exc
    if first is not None:
        raise first


def load_train_state(path: str, opt_state_template=None):
    """Returns (params, opt_state_or_None, step). Pass the freshly-built
    optimizer state as ``opt_state_template`` to restore its exact pytree
    structure (msgpack stores it as nested dicts)."""
    from flax.serialization import from_state_dict

    with open(path, "rb") as handle:
        tree = serialization.msgpack_restore(handle.read())
    params = tree["params"]
    step = int(tree.get("step", 0))
    opt_state = None
    if tree.get("opt_state") and opt_state_template is not None:
        opt_state = from_state_dict(opt_state_template, tree["opt_state"])
    return params, opt_state, step


def load_checkpoint(path: str) -> Dict:
    """Load either a native msgpack checkpoint or a reference torch tar.

    Dispatch is by content, not extension, so the reference's
    ``<model_dir>/weights.tar`` contract keeps working unchanged.
    """
    with open(path, "rb") as handle:
        magic = handle.read(2)
    if magic == b"PK":
        # definitely a torch zip archive: let conversion errors surface
        # (falling through to msgpack would mask the real failure with an
        # unrelated decode error)
        return convert_torch_checkpoint(path)
    if path.endswith((".tar", ".pt", ".pth")):
        # legacy-pickle torch OR a native msgpack checkpoint wearing the
        # reference's torch-style name. Fall through to msgpack only when
        # torch.load itself can't parse the file; once it parses as torch,
        # conversion errors are real and must surface.
        import torch

        try:
            ckpt = torch.load(path, map_location="cpu", weights_only=False)
        except Exception:
            ckpt = None  # not a torch file at all
        if ckpt is not None:
            state_dict = (ckpt["desc"]
                          if isinstance(ckpt, dict) and "desc" in ckpt
                          else ckpt)
            if is_torchvision_backbone_state_dict(state_dict):
                return convert_torchvision_backbone(state_dict)
            return convert_torch_state_dict(state_dict)
    return load_native_checkpoint(path)
