"""Run the reference's ACTUAL default OOD workload once on the real chip.

VERDICT r2 #6: the parity path (f32, 512 random crops + 1 center crop per
image, host PIL crop sampling — ``/root/reference/ood.py:956,872-875``)
had only ever run at tiny crop counts in CPU tests. This drives
``run_ood_split`` with the stock ``PipelineConfig`` (n_views=512, f32,
seeded host crops) over a small synthetic corpus on the TPU and reports
wall time per image + device peak memory, recorded in PERF.md.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/run_reference_default.py
Env: JCF_REF_IMAGES (default 24), JCF_REF_BATCH (default 2)
"""

import dataclasses
import os
import pickle
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np


def main() -> None:
    n_images = int(os.environ.get("JCF_REF_IMAGES", "24"))
    batch = int(os.environ.get("JCF_REF_BATCH", "2"))

    from PIL import Image

    root = f"/tmp/jcf_refdefault_{n_images}"
    img_dir = os.path.join(root, "TestSetB")
    if not os.path.exists(os.path.join(root, ".done")):
        os.makedirs(img_dir, exist_ok=True)
        rng = np.random.default_rng(0)
        for i in range(n_images):
            arr = rng.integers(0, 255, (400, 500, 3), dtype=np.uint8)
            Image.fromarray(arr).save(
                os.path.join(img_dir, f"img_{i:04d}.jpg"), quality=85
            )
        open(os.path.join(root, ".done"), "w").write("ok")

    from jcf_tpu.config import PipelineConfig
    from jcf_tpu.models import VIT_B_32, init_clip_params
    from jcf_tpu.models.loader import state_dict_from_params
    from jcf_tpu.pipelines.ood import run_ood_split

    ckpt = os.path.join(root, "synth_vit_b32.pkl")
    if not os.path.exists(ckpt):
        with open(ckpt, "wb") as f:
            pickle.dump(
                state_dict_from_params(init_clip_params(0, VIT_B_32), VIT_B_32), f
            )

    cfg = PipelineConfig()  # stock defaults: n_views=512, float32, host crops
    assert cfg.tta.n_views == 512 and cfg.runtime.compute_dtype == "float32"
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data,
            root=root,
            test_dir=img_dir,
            classes_file=os.path.join(root, "classes.txt"),
            template_dir=os.path.join(root, "text_template"),
            captions_file=os.path.join(root, "missing.txt"),
        ),
        tta=dataclasses.replace(cfg.tta, batch_images=batch),
        runtime=dataclasses.replace(cfg.runtime, clip_checkpoint=ckpt),
    )
    if not os.path.exists(cfg.data.classes_file):
        with open(cfg.data.classes_file, "w") as f:
            for i in range(cfg.data.num_classes):
                f.write(f"Animal_class{i} {i}\n")

    import jax

    t0 = time.perf_counter()
    out = run_ood_split(cfg)
    elapsed = time.perf_counter() - t0
    total = out["n_base"] + out["n_new"]

    stats = {}
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
    except Exception:
        pass
    peak = stats.get("peak_bytes_in_use")
    peak_s = f"{peak / 2**30:.2f} GiB" if peak else "n/a"
    print(
        f"reference-default OOD (513 crops/image, f32, host PIL crops): "
        f"{total} images in {elapsed:.1f}s = {elapsed / total:.2f} s/image "
        f"(incl. compile + classifier build); device peak memory {peak_s}",
        flush=True,
    )


if __name__ == "__main__":
    main()
