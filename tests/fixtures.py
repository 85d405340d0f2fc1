"""Shared test fixtures: a tiny synthetic COCO dataset on disk.

The TPU-world analog of detectron2's tiny-COCO test fixture (SURVEY §4):
a few small images with simple box/polygon annotations, written as real
JPEG files + instances json so the full data pipeline (IO, transforms,
rasterization, batching, eval GT) is exercised.
"""

import json
import os

import numpy as np


COCO_KP_NAMES = [
    "nose", "left_eye", "right_eye", "left_ear", "right_ear",
    "left_shoulder", "right_shoulder", "left_elbow", "right_elbow",
    "left_wrist", "right_wrist", "left_hip", "right_hip",
    "left_knee", "right_knee", "left_ankle", "right_ankle",
]


def make_tiny_coco(root: str, num_images: int = 4, hw=(96, 128),
                   num_classes: int = 3, keypoints: bool = False):
    from PIL import Image

    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.RandomState(0)
    h, w = hw

    images, annotations = [], []
    ann_id = 1
    for i in range(num_images):
        arr = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        fname = f"img_{i}.jpg"
        Image.fromarray(arr).save(os.path.join(img_dir, fname))
        images.append({"id": i + 1, "file_name": fname, "height": h, "width": w})
        for _ in range(rng.randint(1, 4)):
            bw = float(rng.randint(16, 48))
            bh = float(rng.randint(16, 40))
            x = float(rng.randint(0, w - int(bw) - 1))
            y = float(rng.randint(0, h - int(bh) - 1))
            poly = [x, y, x + bw, y, x + bw, y + bh, x, y + bh]
            ann = {
                "id": ann_id,
                "image_id": i + 1,
                "category_id": int(rng.randint(1, num_classes + 1)),
                "bbox": [x, y, bw, bh],
                "area": bw * bh,
                "iscrowd": 0,
                "segmentation": [poly],
            }
            if keypoints:
                kps = []
                nk = len(COCO_KP_NAMES)
                for _k in range(nk):
                    kx = x + rng.rand() * bw
                    ky = y + rng.rand() * bh
                    vis = int(rng.randint(0, 3))  # 0/1/2 like COCO
                    kps += [float(kx), float(ky), vis]
                ann["keypoints"] = kps
                ann["num_keypoints"] = sum(
                    1 for v in kps[2::3] if v > 0
                )
            annotations.append(ann)
            ann_id += 1

    categories = [
        {"id": c + 1, "name": f"class{c}"} for c in range(num_classes)
    ]
    if keypoints:
        for c in categories:
            c["keypoints"] = COCO_KP_NAMES
    coco = {
        "images": images,
        "annotations": annotations,
        "categories": categories,
    }
    json_path = os.path.join(root, "instances.json")
    with open(json_path, "w") as f:
        json.dump(coco, f)
    return json_path, img_dir
