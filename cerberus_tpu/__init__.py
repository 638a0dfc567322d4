"""cerberus_tpu — a TPU-native multi-task computational-pathology framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
TissueImageAnalytics/cerberus ("One Model is All You Need", Graham et al.,
Medical Image Analysis 2022): one shared CNN encoder feeding five U-Net-style
decoders plus a global-pool tissue classifier, producing simultaneous
gland/nuclei/lumen instance + semantic segmentation and 9-class tissue-type
patch classification, wrapped in tile and whole-slide-image inference engines.

Design (TPU-first, not a port):
  * all six heads compile into ONE XLA program (``infer.steps.make_infer_step``);
  * instance post-processing (connected components, marker watershed,
    morphology) runs on-chip as iterative ``lax`` kernels with a CPU fallback;
  * the WSI engine is an async host pipeline feeding pjit-sharded batches;
  * multi-chip scaling is ``jax.sharding.Mesh`` + collectives, never NCCL.

Public CLI surface (run_infer_tile.py / run_infer_wsi.py flags, the
``weights.tar`` + ``settings.yml`` model-directory contract, and the
``.mat``/``.dat``/overlay output layout) follows the reference bit-for-bit.
"""

__version__ = "0.1.0"
