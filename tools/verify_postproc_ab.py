"""A/B content-identity check: lax-only vs pallas on-chip postproc.

Drives the real WSI CLI twice over a synthetic masked slide — once with
CERBERUS_PALLAS=0 (pure-lax postproc) and once force-enabled (VMEM-resident
+ blocked-strip CC, MXU histogram, blob-shape routing) — and asserts the
per-slide instance payloads are content-identical. Instance dict keys are
per-run uuid4 hex, so tasks compare as sorted multisets of instance-value
signatures; everything else (resolutions, dimensions) compares exactly.

Usage: python tools/verify_postproc_ab.py [--size=8192] [--root=/tmp/verify_ab]
"""
from __future__ import annotations

import glob
import os
import shutil
import subprocess
import sys

import joblib
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_wsi import make_model, make_slide  # noqa: E402

TASKS = ("Nuclei", "Gland", "Lumen")


def _sig(x):
    if isinstance(x, dict):
        return tuple(sorted((repr(k), _sig(v)) for k, v in x.items()))
    if isinstance(x, np.ndarray):
        return (x.dtype.str, x.shape, x.tobytes())
    if isinstance(x, (list, tuple)):
        return tuple(_sig(v) for v in x)
    return repr(x)


def payload(out_dir: str):
    sigs = {}
    for p in sorted(glob.glob(os.path.join(out_dir, "dat", "*.dat"))):
        d = joblib.load(p)
        per = {}
        for k, v in d.items():
            if k in TASKS:
                # keys are uuid4 per run — compare the value multiset
                per[k] = tuple(sorted(_sig(iv) for iv in v.values()))
            else:
                per[k] = _sig(v)
        sigs[os.path.basename(p)] = per
    return sigs


def main():
    size = 8192
    root = "/tmp/verify_ab"
    for a in sys.argv[1:]:
        if a.startswith("--size="):
            size = int(a.split("=", 1)[1])
        elif a.startswith("--root="):
            root = a.split("=", 1)[1]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    slide_dir, msk_dir, _ = make_slide(root, size, 0.25)
    model = make_model(root)

    def run(tag, env_extra):
        out = os.path.join(root, "out_" + tag)
        env = dict(os.environ, **env_extra)
        cmd = [sys.executable, "run_infer_wsi.py", f"--model={model}",
               f"--input_dir={root}/", "--wsi_file_ext=.npy",
               f"--output_dir={out}", f"--msk_dir={msk_dir}/",
               f"--cache_path={os.path.join(root, 'cache_' + tag)}",
               "--batch_size=8", "--nr_inference_workers=0",
               "--nr_post_proc_workers=0", "--postproc_backend=tpu"]
        r = subprocess.run(cmd, cwd=repo, env=env, capture_output=True,
                           text=True, timeout=1800)
        if r.returncode != 0:
            print(tag, "FAILED"); print(r.stdout[-1500:])
            print(r.stderr[-2500:]); sys.exit(1)
        return out

    if "--mode=resident" in sys.argv:
        # HBM-resident hot loop vs the legacy disk-canvas loop, same
        # kernels (VERDICT r4 task 1 'Done' methodology at the CLI surface)
        tag_a, env_a, tag_b, env_b = ("legacy", {"CERBERUS_RESIDENT": "0"},
                                      "resident", {"CERBERUS_RESIDENT": "1"})
    else:
        tag_a, env_a, tag_b, env_b = ("lax", {"CERBERUS_PALLAS": "0"},
                                      "pal", {"CERBERUS_PALLAS": "1"})
    pa = payload(run(tag_a, env_a))
    pb = payload(run(tag_b, env_b))
    counts = {}
    for p in glob.glob(os.path.join(root, "out_" + tag_a, "dat", "*.dat")):
        d = joblib.load(p)
        for t in TASKS:
            counts[t] = counts.get(t, 0) + len(d.get(t, {}))
    print("instances:", counts)
    assert pa, "no dat output produced"
    assert any(counts.values()), "zero instances — vacuous comparison"
    for f in pa:
        for k in pa[f]:
            if pa[f][k] != pb.get(f, {}).get(k):
                print("DIVERGES:", f, k)
    assert pa == pb, "payload divergence between lax and pallas postproc"
    print("A/B CONTENT-IDENTICAL")


if __name__ == "__main__":
    main()
