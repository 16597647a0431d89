"""vtc_tpu — a TPU-native (JAX/XLA/pjit/Pallas) video-text-comment retrieval framework.

Re-implements the capabilities of unitaryai/VTC ("Improving Video-Text Retrieval
with User Comments", ECCV 2022) as an idiomatic TPU framework:

* CLIP ViT-B/32 image + text towers in JAX (``vtc_tpu.models.clip_model``)
* TimeSformer divided space-time attention video tower (``vtc_tpu.models.timesformer``)
* the hierarchical Context Adapter Module over user comments (``vtc_tpu.models.cam``)
* on-device retrieval math: InfoNCE, dense similarity, R@K via all-gather +
  ``lax.top_k`` over the ICI mesh (``vtc_tpu.ops``)
* a host-side input pipeline with per-host sharding (``vtc_tpu.data``)
* a functional trainer with Orbax checkpoints mirroring the reference's
  monitor/early-stop/resume semantics (``vtc_tpu.training``)

The public experiment surface (``train.py``, ``evaluation/eval.py``, jsonc
configs) mirrors the reference so its users can switch over directly.
"""

__version__ = "0.1.0"
