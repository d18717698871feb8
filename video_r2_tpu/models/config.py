"""Model configuration for the Qwen2.5-VL family (TPU rebuild).

One typed config tree (SURVEY §5 calls out the reference's three disjoint
config systems; model config is the first unified piece). Values mirror the HF
checkpoint configs so weights load 1:1.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field


@dataclass(frozen=True)
class VisionConfig:
    depth: int = 32
    hidden_size: int = 1280
    intermediate_size: int = 3420
    num_heads: int = 16
    in_channels: int = 3
    patch_size: int = 14
    spatial_merge_size: int = 2
    temporal_patch_size: int = 2
    tokens_per_second: float = 2.0
    window_size: int = 112
    fullatt_block_indexes: tuple[int, ...] = (7, 15, 23, 31)
    out_hidden_size: int = 3584
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    # remat granularity for the training tower (vit_forward remat=True):
    # 0 = jax.checkpoint per layer; N>1 (dividing depth) = checkpoint per
    # N-layer SEGMENT via a nested scan — fewer, larger remat regions, the
    # VERDICT r3 #9 workaround candidate for the axon remote compiler's
    # depth-32 backward ceiling (validate on chip; numerics identical)
    remat_segment: int = 0

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def patch_input_dim(self) -> int:
        return self.in_channels * self.temporal_patch_size * self.patch_size ** 2

    @property
    def spatial_merge_unit(self) -> int:
        return self.spatial_merge_size ** 2


@dataclass(frozen=True)
class TextConfig:
    vocab_size: int = 152064
    hidden_size: int = 3584
    intermediate_size: int = 18944
    num_hidden_layers: int = 28
    num_attention_heads: int = 28
    num_key_value_heads: int = 4
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1_000_000.0
    mrope_section: tuple[int, int, int] = (16, 24, 24)
    max_position_embeddings: int = 128_000
    tie_word_embeddings: bool = False
    # Qwen3 family (the judge model's shape): explicit head_dim decoupled
    # from hidden/heads, per-head q/k RMS norm, no attention bias
    head_dim_override: int = 0
    qk_norm: bool = False
    attention_bias: bool = True
    # MoE (num_experts > 0 makes every layer's MLP a sparse MoE block —
    # Qwen3MoeSparseMoeBlock semantics; experts shard over the "ep" axis)
    num_experts: int = 0
    num_experts_per_tok: int = 8
    moe_intermediate_size: int = 0
    norm_topk_prob: bool = True
    # Serving knobs for the grouped dispatch (models/moe.py): 0.0 = full
    # capacity (exact, no drops — HF parity; expert compute is E/k times the
    # useful work). Production serving sets ~1.25-2.0: per-group expert
    # capacity C = ceil(group * k * cf / E), over-capacity tokens drop
    # (GShard semantics) and expert compute shrinks to ~cf x useful.
    moe_capacity_factor: float = 0.0
    moe_group_size: int = 256
    # Decode: small steps (T <= ops.moe_ragged.RAGGED_MAX_TOKENS) read
    # ONLY the routed experts' weights via the ragged Pallas kernel
    # (megablox-style — the all-experts einsum is all-weights-HBM-bound at
    # decode batch sizes). Exact (no drops). Under an ep x tp serving mesh
    # the kernel runs per shard (moe_mlp_ragged_sharded); other mesh
    # shapes fall back to the einsum.
    moe_ragged_decode: bool = False
    # Prefill: sorted grouped matmul (ops/moe_gmm.py) over exactly the
    # routed rows — exact at ~1.1-1.5x the routed compute, vs the einsum's
    # exact mode (capacity_factor=0) allocating group*k slots for EVERY
    # expert (~E x compute + multi-GB activations at the judge shape).
    # Float weights differentiate (recompute custom VJP, grads == einsum);
    # int8/W8A8 variants are inference-only and the shipped trainers force
    # the einsum regardless (make_sft_step / make_grpo_step).
    moe_gmm_prefill: bool = False

    @property
    def head_dim(self) -> int:
        if self.head_dim_override:
            return self.head_dim_override
        return self.hidden_size // self.num_attention_heads

    @property
    def num_kv_groups(self) -> int:
        return self.num_attention_heads // self.num_key_value_heads


@dataclass(frozen=True)
class ModelConfig:
    vision: VisionConfig = field(default_factory=VisionConfig)
    text: TextConfig = field(default_factory=TextConfig)
    # Special token ids (Qwen2.5-VL tokenizer).
    image_token_id: int = 151655
    video_token_id: int = 151656
    vision_start_token_id: int = 151652
    vision_end_token_id: int = 151653
    bos_token_id: int = 151643
    eos_token_id: int = 151645   # <|im_end|>
    pad_token_id: int = 151643
    dtype: str = "bfloat16"
    # Text-only families (the judge role): no vision tower is initialized,
    # loaded, or expected in checkpoints.
    has_vision: bool = True

    def replace(self, **kw) -> "ModelConfig":
        return dataclasses.replace(self, **kw)


def qwen25vl_7b() -> ModelConfig:
    """Qwen/Qwen2.5-VL-7B-Instruct (the Video-R2 base model)."""
    return ModelConfig()


def qwen25vl_3b() -> ModelConfig:
    return ModelConfig(
        text=TextConfig(hidden_size=2048, intermediate_size=11008,
                        num_hidden_layers=36, num_attention_heads=16,
                        num_key_value_heads=2, vocab_size=151936,
                        tie_word_embeddings=True),
        vision=VisionConfig(out_hidden_size=2048),
    )


def qwen3_moe_30b_a3b() -> ModelConfig:
    """Qwen3-30B-A3B (MoE) — the servable judge-class model family (the
    reference's judge Qwen3-Next-80B-A3B is this family's shape: sparse MoE,
    qk-norm, bias-free attention — serve_qwen3.sh:11-17 runs it on vLLM;
    our engine hosts it natively, experts sharded over "ep"). Text-only:
    the vision tower is never materialized for the judge role."""
    return ModelConfig(
        text=TextConfig(
            vocab_size=151936, hidden_size=2048, intermediate_size=6144,
            num_hidden_layers=48, num_attention_heads=32,
            num_key_value_heads=4, head_dim_override=128, qk_norm=True,
            attention_bias=False, num_experts=128, num_experts_per_tok=8,
            moe_intermediate_size=768, norm_topk_prob=True,
            # judge serving runs EXACT (no drops): measured at this routing
            # shape (profile_moe_capacity.py, r4), decode steps never drop
            # at any factor, but skewed-router PREFILL drops 15-64% of
            # router weight even at 2.0 — not a safe tradeoff for judging
            # quality. Exactness is CHEAP here: decode reads only routed
            # experts (moe_ragged_decode) and prefill computes only routed
            # rows (moe_gmm_prefill — the einsum's exact mode would be
            # ~E x oversized at E=128 and OOM at real prompt lengths);
            # capacity_factor only governs the einsum fallback/training.
            moe_capacity_factor=0.0, moe_ragged_decode=True,
            moe_gmm_prefill=True,
            mrope_section=(22, 21, 21),  # text-only: plain RoPE (equal pos)
            rope_theta=1_000_000.0,
        ),
        eos_token_id=151645, pad_token_id=151643, has_vision=False,
    )


def qwen25vl_72b() -> ModelConfig:
    return ModelConfig(
        text=TextConfig(hidden_size=8192, intermediate_size=29568,
                        num_hidden_layers=80, num_attention_heads=64,
                        num_key_value_heads=8),
        vision=VisionConfig(out_hidden_size=8192),
    )


def tiny_test_config(vocab_size: int = 512) -> ModelConfig:
    """Small config for CPU golden tests vs HF (dims aligned to head counts)."""
    return ModelConfig(
        vision=VisionConfig(
            depth=4, hidden_size=64, intermediate_size=128, num_heads=4,
            out_hidden_size=48, fullatt_block_indexes=(2,), window_size=112,
        ),
        text=TextConfig(
            vocab_size=vocab_size, hidden_size=48, intermediate_size=96,
            num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
            mrope_section=(2, 2, 2),  # sums to head_dim/2 = 6
            rope_theta=10000.0, tie_word_embeddings=False,
        ),
        image_token_id=500, video_token_id=501, vision_start_token_id=502,
        vision_end_token_id=503, bos_token_id=0, eos_token_id=1, pad_token_id=0,
        dtype="float32",
    )
