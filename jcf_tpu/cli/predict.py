"""`jcf-predict` — two-head top-5 prediction -> final_results/result.txt
(reference test.py)."""

from jcf_tpu.cli._args import build_parser, config_from_args
from jcf_tpu.pipelines import run_predict


def main() -> None:
    p = build_parser("Final top-5 prediction over the OOD split", default_seed=346373)
    p.add_argument("--results_dir", type=str, default="final_results")
    p.add_argument(
        "--swa_dir", type=str, default="",
        help="folder of stage-1 LoRA pkls to average (SWA, test.py:736-816) "
             "instead of loading the single stage-1 checkpoint",
    )
    args = p.parse_args()
    import dataclasses

    from jcf_tpu.utils import set_random_seed

    set_random_seed(args.seed)
    cfg = config_from_args(args)
    if args.swa_dir:
        cfg = dataclasses.replace(
            cfg, stage1=dataclasses.replace(cfg.stage1, swa_dir=args.swa_dir)
        )
    run_predict(cfg, results_dir=args.results_dir)


if __name__ == "__main__":
    main()
