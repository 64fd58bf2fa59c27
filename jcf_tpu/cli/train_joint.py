"""`jcf-train-joint` — stage-2 joint training (reference slow_pace.py)."""

from jcf_tpu.cli._args import build_parser, config_from_args
from jcf_tpu.pipelines import run_train_joint


def main() -> None:
    p = build_parser("Stage-2 joint training (prompts + LoRA + heads)", default_seed=346373)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--moco_checkpoint", type=str, default="r-50-1000ep.pkl")
    args = p.parse_args()
    import dataclasses

    from jcf_tpu.utils import set_random_seed

    set_random_seed(args.seed)
    cfg = config_from_args(args)
    cfg = dataclasses.replace(
        cfg,
        stage2=dataclasses.replace(
            cfg.stage2, epochs=args.epochs, moco_checkpoint=args.moco_checkpoint
        ),
    )
    run_train_joint(cfg)


if __name__ == "__main__":
    main()
