"""Subprocess body for tests/test_distributed_2proc.py: one multi-host
process — real ``jax.distributed.initialize`` over a localhost coordinator,
``shard_slides`` to pick this process's tiles, then the REAL tile pipeline
over that shard (the multi-host analog of the reference's manual bulk-idx
job sharding, run_infer_wsi.py:89-95).

Launched with PYTHONPATH free of the axon plugin + JAX_PLATFORMS=cpu so each
process owns one CPU device and the 2-process global mesh is pure-CPU.
"""
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    coord = sys.argv[3]
    model_dir, input_dir, output_dir = sys.argv[4:7]

    from cerberus_tpu.parallel.distributed import (
        initialize,
        process_info,
        shard_slides,
    )

    initialize(coordinator_address=coord, num_processes=nproc,
               process_id=pid)

    import jax

    assert process_info() == (pid, nproc), process_info()
    # the global device view spans both processes; exactly one is ours
    assert len(jax.devices()) == nproc, jax.devices()
    assert len(jax.local_devices()) == 1

    names = sorted(os.listdir(input_dir))
    mine, _ = shard_slides(names, [None] * len(names))

    my_in = os.path.join(output_dir, f"_in_p{pid}")
    os.makedirs(my_in, exist_ok=True)
    for nm in mine:
        shutil.copy(os.path.join(input_dir, nm), os.path.join(my_in, nm))

    import yaml

    from cerberus_tpu.infer.tile import InferManager

    with open(os.path.join(model_dir, "settings.yml")) as f:
        settings = yaml.safe_load(f)

    infer = InferManager(
        checkpoint_path=os.path.join(model_dir, "weights.tar"),
        decoder_dict=settings["dataset_kwargs"]["req_target_code"],
        model_args=settings["model_kwargs"],
    )
    infer.process_file_list({
        "nr_inference_workers": 0,
        "nr_post_proc_workers": 0,
        "batch_size": 4,
        "input_dir": my_in,
        "output_dir": output_dir,
        "patch_input_shape": 144,
        "patch_output_shape": 48,
        "patch_output_overlap": 0,
        "postproc_list": ["gland", "lumen", "nuclei", "patch-class"],
    })
    print(f"WORKER_OK {pid} {','.join(mine)}", flush=True)


if __name__ == "__main__":
    main()
