"""`jcf-train-lora` — stage-1 LoRA training (reference lora_train_vlp.py)."""

from jcf_tpu.cli._args import build_parser, config_from_args
from jcf_tpu.pipelines import run_train_lora


def main() -> None:
    p = build_parser("Stage-1 LoRA fine-tuning", default_seed=1)
    p.add_argument("--epochs", type=int, default=50)
    args = p.parse_args()
    import dataclasses

    from jcf_tpu.utils import set_random_seed

    set_random_seed(args.seed)
    cfg = config_from_args(args)
    cfg = dataclasses.replace(cfg, stage1=dataclasses.replace(cfg.stage1, epochs=args.epochs))
    run_train_lora(cfg)


if __name__ == "__main__":
    main()
