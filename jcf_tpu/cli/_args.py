"""Shared argparse -> PipelineConfig builder.

Covers the reference's per-script flags (``/root/reference/ood.py:684-717``,
``test.py:859-895``) plus the knobs the reference hard-codes (crop count,
dtype, attention impl), unified per SURVEY.md §5.
"""

from __future__ import annotations

import argparse
import dataclasses

from jcf_tpu.config import PipelineConfig, perf_preset


def build_parser(description: str, default_seed: int) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--seed", type=int, default=default_seed)
    p.add_argument("--root_path", type=str, default="Dataset")
    p.add_argument("--shots", type=int, default=4)
    p.add_argument("--backbone", type=str, default="ViT-B/32")
    p.add_argument("--clip_checkpoint", type=str, default="ViT-B-32.pkl")
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--batch_size", type=int, default=None)
    # LoRA flags (ood.py:698-706)
    p.add_argument("--position", type=str, default="all",
                   choices=["bottom", "mid", "up", "half-up", "half-bottom", "all", "top3"])
    p.add_argument("--encoder", type=str, choices=["text", "vision", "both"], default="both")
    p.add_argument("--params", type=str, nargs="+", default=["q", "k", "v"])
    p.add_argument("--r", type=int, default=4)
    p.add_argument("--alpha", type=float, default=1)
    p.add_argument("--dropout_rate", type=float, default=0.25)
    # TPU-native knobs. n_views/batch_images default to None so an
    # explicitly passed value can be told apart from the default and wins
    # over the --perf preset (ADVICE r2).
    p.add_argument("--n_views", type=int, default=None,
                   help="TTA crop count (reference default: 512; perf preset: 8)")
    p.add_argument("--batch_images", type=int, default=None)
    p.add_argument("--dtype", type=str, choices=["float32", "bfloat16"], default="float32")
    p.add_argument("--attention_impl", type=str, default=None,
                   choices=[None, "pallas", "xla"], nargs="?")
    p.add_argument("--perf", action="store_true", help="use the BASELINE perf preset")
    return p


def config_from_args(args: argparse.Namespace) -> PipelineConfig:
    cfg = perf_preset() if getattr(args, "perf", False) else PipelineConfig()
    d = cfg.data
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            d,
            root=args.root_path,
            classes_file=f"{args.root_path}/classes.txt",
            train_split=f"{args.root_path}/train.txt",
            val_split=f"{args.root_path}/valid1.txt",
            test_dir=f"{args.root_path}/TestSetB",
            shots=args.shots,
        ),
        lora=dataclasses.replace(
            cfg.lora,
            r=args.r, alpha=args.alpha, dropout_rate=args.dropout_rate,
            params=tuple(args.params), encoder=args.encoder,
            position=args.position, backbone=args.backbone,
        ),
        tta=dataclasses.replace(
            cfg.tta,
            # explicit flags override the preset; otherwise the preset (or
            # base-config) value stands
            n_views=args.n_views if args.n_views is not None else cfg.tta.n_views,
            batch_images=(
                args.batch_images
                if args.batch_images is not None
                else cfg.tta.batch_images
            ),
        ),
        runtime=dataclasses.replace(
            cfg.runtime,
            clip_checkpoint=args.clip_checkpoint,
            compute_dtype=args.dtype if not getattr(args, "perf", False) else cfg.runtime.compute_dtype,
            attention_impl=args.attention_impl,
        ),
        stage1=dataclasses.replace(cfg.stage1, seed=args.seed, lr=args.lr,
                                   batch_size=args.batch_size or cfg.stage1.batch_size),
        stage2=dataclasses.replace(cfg.stage2, lr=args.lr,
                                   batch_size=args.batch_size or cfg.stage2.batch_size),
    )
    return cfg
