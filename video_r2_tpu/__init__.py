"""video_r2_tpu — a TPU-native video-reasoning MLLM framework.

A from-scratch JAX / XLA / Pallas / pjit rebuild of the capabilities of
mbzuai-oryx/Video-R2 (Qwen2.5-VL-7B video reasoning stack):

- ``video``    : video decode / frame sampling / timestamp + subtitle burn-in /
                 smart_resize, plus a jittable on-device resize→normalize→patchify
                 preprocessing graph.
- ``models``   : Qwen2.5-VL model family (ViT with windowed attention, 2x2 patch
                 merger, M-RoPE decoder) as functional JAX with HF weight loading.
- ``ops``      : Pallas TPU kernels (flash attention, fused linear cross-entropy,
                 chunked GRPO loss, paged attention) with XLA reference paths.
- ``parallel`` : device mesh construction and sharding rules (FSDP/TP/DP axes).
- ``engine``   : batched generation engine (prefill + KV-cache decode, sampling),
                 OpenAI-compatible serving for the judge role.
- ``data``     : SFT / GRPO dataset pipelines (LLaVA-format JSON).
- ``train``    : SFT and GRPO trainers (group rollouts, KL-to-ref, PPO-clip,
                 advantage variants), optimizer param groups, checkpointing.
- ``rewards``  : accuracy / format / temporal-alignment reward functions.
- ``evalharness``: lmms-eval-compatible benchmark harness + TAC / VAS metrics.
"""

__version__ = "0.1.0"
