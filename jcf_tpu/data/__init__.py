from jcf_tpu.data.transforms import (
    CLIP_MEAN,
    CLIP_STD,
    MOCO_MEAN,
    MOCO_STD,
    resize_short_side,
    center_crop,
    to_chw_array,
    normalize,
    preprocess_center,
    RandomResizedCrop,
    TTACropSampler,
)
from jcf_tpu.data.datasets import (
    Datum,
    read_classnames,
    read_labeled_split,
    read_path_list,
    walk_test_dir,
    generate_fewshot,
    TrainDataset,
    TTADataset,
)
from jcf_tpu.data.loader import DataLoader
from jcf_tpu.data.templates import (
    load_class_templates,
    load_template_file,
    synthesize_templates,
    TEMPLATE_PATTERNS,
)

__all__ = [
    "CLIP_MEAN", "CLIP_STD", "MOCO_MEAN", "MOCO_STD",
    "resize_short_side", "center_crop", "to_chw_array", "normalize",
    "preprocess_center", "RandomResizedCrop", "TTACropSampler",
    "Datum", "read_classnames", "read_labeled_split", "read_path_list",
    "walk_test_dir", "generate_fewshot", "TrainDataset", "TTADataset",
    "DataLoader",
    "load_class_templates", "load_template_file", "synthesize_templates",
    "TEMPLATE_PATTERNS",
]
