"""Real 2-process ``jax.distributed`` run on CPU (VERDICT r3 task 4).

Two local processes initialize against a localhost coordinator
(``parallel/distributed.initialize`` — the path BASELINE config 5's
multi-host cohort rests on), ``shard_slides`` splits a 4-tile job, each
process drives its shard through the REAL tile pipeline, and the union of
their outputs must equal a single-process run over all 4 tiles.

Reference match: run_infer_wsi.py:89-95 manual bulk-idx sharding, subsumed
by multi-host init + deterministic strided assignment.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest
import scipy.io as sio
import yaml

import jax

from cerberus_tpu.config import (
    DEFAULT_DECODER_KWARGS,
    DEFAULT_TARGET_CODE,
    DEFAULT_TARGET_LIST,
    ModelConfig,
)
from cerberus_tpu.models.convert import save_checkpoint
from cerberus_tpu.models.net_desc import init_net_params

MODEL_KWARGS = {
    "encoder_backbone_name": "resnet34",
    "decoder_kwargs": DEFAULT_DECODER_KWARGS,
    "considered_tasks": list(DEFAULT_DECODER_KWARGS.keys()),
}

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "_distributed_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _worker_env() -> dict:
    """Pure-CPU JAX for the children: drop the TPU plugin's sitecustomize
    from PYTHONPATH and pin the platform (two processes must not contend
    for the single tunneled chip)."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # 1 local CPU device per process
    return env


@pytest.fixture(scope="module")
def job(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("dist2proc")
    model_dir = root / "model"
    os.makedirs(model_dir)
    cfg = ModelConfig.from_kwargs(MODEL_KWARGS)
    save_checkpoint(str(model_dir / "weights.tar"),
                    init_net_params(jax.random.PRNGKey(42), cfg))
    with open(model_dir / "settings.yml", "w") as f:
        yaml.safe_dump({
            "dataset_kwargs": {"req_target_code": dict(DEFAULT_TARGET_CODE)},
            "model_kwargs": MODEL_KWARGS,
        }, f)

    input_dir = root / "input"
    os.makedirs(input_dir)
    rng = np.random.default_rng(0)
    names = [f"t{i}" for i in range(4)]
    for name in names:
        img = rng.integers(0, 255, (100, 120, 3), np.uint8)
        cv2.imwrite(str(input_dir / f"{name}.png"), img)
    return model_dir, input_dir, names


@pytest.mark.skipif(not os.environ.get("CERBERUS_SLOW_TESTS"),
                    reason="two full pipeline compiles in subprocesses + an "
                           "oracle run (~7.5 min); CERBERUS_SLOW_TESTS=1 "
                           "enables (verified green 2026-08-19, 448 s)")
def test_two_process_distributed_union_matches_single(job, tmp_path):
    model_dir, input_dir, names = job
    port = _free_port()
    coord = f"localhost:{port}"
    out_dist = tmp_path / "out_dist"
    os.makedirs(out_dist)

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", coord,
             str(model_dir), str(input_dir), str(out_dist)],
            env=_worker_env(), stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"WORKER_OK {pid}" in out

    # strided assignment: worker 0 got t0,t2; worker 1 got t1,t3
    shard0 = outs[0].split(f"WORKER_OK 0 ")[1].split()[0].split(",")
    shard1 = outs[1].split(f"WORKER_OK 1 ")[1].split()[0].split(",")
    assert sorted(shard0 + shard1) == sorted(f"{n}.png" for n in names)
    assert not set(shard0) & set(shard1)

    # single-process oracle over ALL tiles, in this process (CPU-pinned)
    from cerberus_tpu.infer.tile import InferManager

    out_single = tmp_path / "out_single"
    os.makedirs(out_single)
    infer = InferManager(
        checkpoint_path=str(model_dir / "weights.tar"),
        decoder_dict=dict(DEFAULT_TARGET_CODE),
        model_args=MODEL_KWARGS,
    )
    infer.process_file_list({
        "nr_inference_workers": 0,
        "nr_post_proc_workers": 0,
        "batch_size": 4,
        "input_dir": str(input_dir),
        "output_dir": str(out_single),
        "patch_input_shape": 144,
        "patch_output_shape": 48,
        "patch_output_overlap": 0,
        "postproc_list": list(DEFAULT_TARGET_LIST),
    })

    for name in names:
        for task in ["gland", "lumen", "nuclei"]:
            a = sio.loadmat(str(out_dist / f"{task}_mat" / f"{name}.mat"))
            b = sio.loadmat(str(out_single / f"{task}_mat" / f"{name}.mat"))
            np.testing.assert_array_equal(
                a["inst_map"], b["inst_map"],
                err_msg=f"{task}/{name} inst_map")
        a = sio.loadmat(str(out_dist / "pclass_mat" / f"{name}.mat"))
        b = sio.loadmat(str(out_single / "pclass_mat" / f"{name}.mat"))
        np.testing.assert_array_equal(a["pclass"], b["pclass"])
