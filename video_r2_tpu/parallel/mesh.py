"""Device mesh construction (replaces torchrun + DeepSpeed topology, N3/N4).

Axes:
- "dp"   : pure data parallel (replicated params)
- "fsdp" : sharded-parameter data parallel (ZeRO-3 equivalent; params and
           optimizer state sharded, all-gathered per layer by XLA)
- "pp"   : pipeline parallel — the stacked decoder-layer axis sharded into
           stages; activations hop stage-to-stage via ppermute
           (parallel/pipeline.py GPipe schedule)
- "sp"   : sequence (context) parallel — long-video activations sharded
           along the sequence axis; attention mixes shards through
           ops/sp_attention.py (all-gather KV + LSE merge)
- "ep"   : expert parallel — MoE expert axis sharded across devices; tokens
           reach their experts through the all_to_all pair GSPMD inserts
           around models/moe.py's dispatch/combine einsums
- "tp"   : tensor parallel (megatron-style head/intermediate sharding)

Collectives ride ICI inside a slice; the mesh axis order puts "tp" innermost so
its all-reduces stay on the fastest links, with "sp" just outside it (its
per-layer KV gathers are the next-chattiest). "pp" sits outermost after "dp":
its once-per-tick activation handoff is the least bandwidth-hungry axis, the
one that tolerates DCN between slices.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import numpy as np
from jax.sharding import Mesh


@dataclass(frozen=True)
class MeshConfig:
    dp: int = 1
    pp: int = 1
    fsdp: int = 1
    sp: int = 1
    ep: int = 1
    tp: int = 1

    @property
    def num_devices(self) -> int:
        return self.dp * self.pp * self.fsdp * self.sp * self.ep * self.tp


def make_mesh(cfg: MeshConfig | None = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if cfg is None:
        cfg = MeshConfig(fsdp=len(devices))
    n = cfg.num_devices
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(cfg.dp, cfg.pp, cfg.fsdp, cfg.sp,
                                          cfg.ep, cfg.tp)
    return Mesh(arr, ("dp", "pp", "fsdp", "sp", "ep", "tp"))


def init_distributed(coordinator: str | None = None, num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Multi-host initialization (replaces torchrun; single launcher per host)."""
    if coordinator is not None:
        jax.distributed.initialize(coordinator, num_processes, process_id)
