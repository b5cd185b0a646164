"""blim_tpu — a TPU-native framework for bidirectional-likelihood text-video retrieval.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of mlvlab/BLiM
(ICCV 2025): reranking a fast retriever's top-k candidates with likelihoods
computed by a multimodal LLM (VideoChat-Flash = UMT ViT-L vision tower + ToMe
token compression + Qwen2-7B), CPN prior normalization, LoRA fine-tuning, and
sharded evaluation over a `jax.sharding.Mesh`.

Layout:
  core/         mesh + sharding setup, precision policy, config dataclasses
  kernels/      Pallas TPU kernels (flash attention, fused CE) with XLA fallbacks
  models/       functional model stacks: qwen2, umt_vit, tome projector, videochat_flash
  adapters/     LoRA (pure pytree transforms, replaces peft)
  data/         ChatML prompting, VTG/TVG static sequence layouts, dataset adapters
  scoring/      likelihood criteria, CPN, score fusion, recall metrics
  engine/       rerank engine, pjit train step, eval driver
  pipelines/    CLI entry points (train/eval/extract)
  checkpoints/  HF torch checkpoint -> pytree conversion, Orbax save/load
  utils/        metric logging, distributed helpers, profiling
"""

__version__ = "0.1.0"
