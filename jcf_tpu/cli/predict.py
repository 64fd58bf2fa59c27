"""`jcf-predict` — two-head top-5 prediction -> final_results/result.txt
(reference test.py)."""

from jcf_tpu.cli._args import build_parser, config_from_args
from jcf_tpu.pipelines import run_predict


def main() -> None:
    p = build_parser("Final top-5 prediction over the OOD split", default_seed=346373)
    p.add_argument("--results_dir", type=str, default="final_results")
    args = p.parse_args()
    from jcf_tpu.utils import set_random_seed

    set_random_seed(args.seed)
    run_predict(config_from_args(args), results_dir=args.results_dir)


if __name__ == "__main__":
    main()
