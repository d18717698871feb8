"""SFT dataset + collator: LLaVA JSON -> device-ready masked-CE batches.

Parity surface: train/src/dataset/sft_dataset.py (per-turn tokenization with
prompt masking, vision packing, right-pad collation). TPU-first differences:

- the collator emits the COMPLETE static-shape batch the jitted step consumes:
  bucketed input_ids/labels/attention_mask, M-RoPE position_ids (host-planned
  here, not in the trainer), concatenated vision patches and the planned
  VisionLayout — nothing data-dependent remains for the device graph;
- vision placeholders expand to exact pad-token counts from grid_thw (the HF
  processor did this implicitly);
- preprocessing runs through the single video/ pipeline (no per-pillar copies).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from pathlib import Path
from typing import Any

import numpy as np

from ..engine.chat import expand_vision_placeholders
from ..models.config import ModelConfig
from ..models.mrope import get_rope_index
from ..models.vision import VisionLayout, plan_vision_layout
from ..video import VideoPreprocessConfig, fetch_image, fetch_video
from .config import DataConfig
from .constants import (
    DEFAULT_SYSTEM_MESSAGE,
    IGNORE_INDEX,
    IM_END,
    IM_START,
    IMAGE_PAD,
    VIDEO_PAD,
)
from .conversion import llava_to_openai


def _resolve(path: str, folder: str) -> str:
    if os.path.exists(path) or path.startswith("http"):
        return path
    return os.path.join(folder, path)


@dataclass
class SFTExample:
    input_ids: np.ndarray          # [S]
    labels: np.ndarray             # [S]
    video_patches: np.ndarray | None
    video_grid_thw: list[tuple[int, int, int]]
    image_patches: np.ndarray | None
    image_grid_thw: list[tuple[int, int, int]]
    second_per_grid_ts: list[float]


class SFTDataset:
    """Map-style dataset over LLaVA-format records."""

    def __init__(self, data: str | list, tokenizer, cfg: ModelConfig,
                 dcfg: DataConfig, system_message: str = DEFAULT_SYSTEM_MESSAGE):
        self.records = (json.load(open(data)) if isinstance(data, str) else data)
        self.tok = tokenizer
        self.cfg = cfg
        self.dcfg = dcfg
        self.system_message = system_message
        self.vcfg = VideoPreprocessConfig(
            fps_max_frames=dcfg.fps_max_frames,
            write_timestamps=dcfg.write_timestamps,
            write_subtitles=dcfg.write_subtitles,
        )

    def __len__(self):
        return len(self.records)

    def _load_vision(self, rec: dict):
        videos, images = [], []
        if "image" in rec:
            files = rec["image"] if isinstance(rec["image"], list) else [rec["image"]]
            for f in files:
                ele = {"image": _resolve(f, self.dcfg.image_folder),
                       "min_pixels": self.dcfg.image_min_pixels,
                       "max_pixels": self.dcfg.image_max_pixels}
                if self.dcfg.image_resized_width:
                    ele["resized_width"] = self.dcfg.image_resized_width
                    ele["resized_height"] = self.dcfg.image_resized_height
                images.append(fetch_image(ele))
        elif "video" in rec:
            files = rec["video"] if isinstance(rec["video"], list) else [rec["video"]]
            for f in files:
                sub = None
                if self.dcfg.video_subtitles_folder and isinstance(f, str):
                    cand = Path(os.path.join(self.dcfg.video_subtitles_folder, f)
                                ).with_suffix(".srt")
                    sub = str(cand) if cand.exists() else None
                ele = {"video": _resolve(f, self.dcfg.image_folder)
                       if isinstance(f, str) else f,  # frames passthrough
                       "subtitles": sub,
                       "min_pixels": self.dcfg.video_min_pixels,
                       "max_pixels": self.dcfg.video_max_pixels,
                       "fps": self.dcfg.fps}
                if self.dcfg.video_resized_width:
                    ele["resized_width"] = self.dcfg.video_resized_width
                    ele["resized_height"] = self.dcfg.video_resized_height
                if "video_fps" in rec:
                    ele["video_fps"] = rec["video_fps"]
                videos.append(fetch_video(ele, self.vcfg))
        return images, videos

    def __getitem__(self, i: int) -> SFTExample:
        rec = self.records[i]
        is_video = "video" in rec
        images, videos = self._load_vision(rec)
        conv = llava_to_openai(rec["conversations"], is_video=is_video)

        vid_counts = [v.num_tokens for v in videos]
        img_counts = [im.patches.shape[0] // 4 for im in images]

        ids_parts: list[list[int]] = []
        lab_parts: list[list[int]] = []
        if self.system_message:
            sys_ids = self.tok.encode(
                f"{IM_START}system\n{self.system_message}{IM_END}\n")
            ids_parts.append(sys_ids)
            lab_parts.append([IGNORE_INDEX] * len(sys_ids))

        for j in range(0, len(conv), 2):
            user, gpt = conv[j], conv[j + 1]
            prompt_text = (f"{IM_START}{user['role']}\n{user['content']}{IM_END}\n"
                           f"{IM_START}{gpt['role']}\n")
            if VIDEO_PAD in prompt_text or IMAGE_PAD in prompt_text:
                prompt_text = expand_vision_placeholders(
                    prompt_text, vid_counts, img_counts)
            prompt_ids = self.tok.encode(prompt_text)
            resp_ids = self.tok.encode(f"{gpt['content']}{IM_END}\n")
            ids_parts.append(prompt_ids)
            lab_parts.append([IGNORE_INDEX] * len(prompt_ids))
            ids_parts.append(resp_ids)
            lab_parts.append(list(resp_ids))

        input_ids = np.concatenate([np.asarray(p, np.int32) for p in ids_parts])
        labels = np.concatenate([np.asarray(p, np.int32) for p in lab_parts])
        if input_ids.shape[0] > self.dcfg.max_seq_length:
            input_ids = input_ids[: self.dcfg.max_seq_length]
            labels = labels[: self.dcfg.max_seq_length]

        return SFTExample(
            input_ids=input_ids,
            labels=labels,
            video_patches=(np.concatenate([v.patches for v in videos])
                           if videos else None),
            video_grid_thw=[v.grid_thw for v in videos],
            image_patches=(np.concatenate([im.patches for im in images])
                           if images else None),
            image_grid_thw=[im.grid_thw for im in images],
            second_per_grid_ts=[v.second_per_grid_t for v in videos],
        )


@dataclass
class SFTBatch:
    """Device-ready batch + static layouts."""

    arrays: dict[str, Any]               # input_ids, labels, attention_mask,
                                         # position_ids, video/image patches
    video_layout: VisionLayout | None
    image_layout: VisionLayout | None


class SFTCollator:
    """Right-pad to a bucketed length; plan vision layouts; compute M-RoPE
    positions (parity: DataCollatorForSupervisedDataset + the monkey-patched
    forward's get_rope_index call, done host-side here)."""

    def __init__(self, cfg: ModelConfig, dcfg: DataConfig):
        self.cfg = cfg
        self.dcfg = dcfg

    def __call__(self, examples: list[SFTExample]) -> SFTBatch:
        B = len(examples)
        mult = self.dcfg.pad_to_multiple
        smax = max(e.input_ids.shape[0] for e in examples)
        smax = -(-smax // mult) * mult
        pad_id = self.cfg.pad_token_id
        ids = np.full((B, smax), pad_id, np.int32)
        labels = np.full((B, smax), IGNORE_INDEX, np.int32)
        mask = np.zeros((B, smax), np.int32)
        for b, e in enumerate(examples):
            L = e.input_ids.shape[0]
            ids[b, :L] = e.input_ids
            labels[b, :L] = e.labels
            mask[b, :L] = 1

        video_grids = [g for e in examples for g in e.video_grid_thw]
        image_grids = [g for e in examples for g in e.image_grid_thw]
        spg = np.asarray(
            [s for e in examples for s in e.second_per_grid_ts], np.float64)

        pos, _ = get_rope_index(
            ids, self.cfg,
            image_grid_thw=np.asarray(image_grids) if image_grids else None,
            video_grid_thw=np.asarray(video_grids) if video_grids else None,
            second_per_grid_ts=spg if len(spg) else None,
            attention_mask=mask)

        arrays = {
            "input_ids": ids,
            "labels": labels,
            "attention_mask": mask,
            "position_ids": pos,
        }
        video_layout = image_layout = None
        if video_grids:
            arrays["video_patches"] = np.concatenate(
                [e.video_patches for e in examples if e.video_patches is not None])
            video_layout = plan_vision_layout(video_grids, self.cfg.vision)
        if image_grids:
            arrays["image_patches"] = np.concatenate(
                [e.image_patches for e in examples if e.image_patches is not None])
            image_layout = plan_vision_layout(image_grids, self.cfg.vision)
        return SFTBatch(arrays, video_layout, image_layout)
