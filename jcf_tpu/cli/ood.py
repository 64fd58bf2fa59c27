"""`jcf-ood` — zero-shot OOD base/new split of TestSetB (reference ood.py)."""

from jcf_tpu.cli._args import build_parser, config_from_args
from jcf_tpu.pipelines import run_ood_split


def main() -> None:
    args = build_parser("Zero-shot OOD split of TestSetB", default_seed=1).parse_args()
    from jcf_tpu.utils import set_random_seed

    set_random_seed(args.seed)
    run_ood_split(config_from_args(args))


if __name__ == "__main__":
    main()
