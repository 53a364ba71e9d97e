"""Image demo (re-design of reference image.py:1-39): build -> speedup() ->
set_image -> predict with 2 points, save blended masks."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from PIL import Image

from sam2_opt_tpu import build_sam2_image_predictor


def main(
    image_path="/root/reference/sam2/notebooks/images/truck.jpg",
    checkpoint=None,
    variant="hiera_l",
    output_dir="outputs/image_demo",
):
    predictor = build_sam2_image_predictor(variant, checkpoint)
    predictor.speedup()  # one-line acceleration: jit-compile to XLA bf16

    image = np.array(Image.open(image_path).convert("RGB"))
    predictor.set_image(image)

    point_coords = np.array([[500, 375], [1125, 625]], np.float32)
    point_labels = np.array([1, 1], np.int32)
    masks, ious, _ = predictor.predict(
        point_coords=point_coords, point_labels=point_labels
    )
    print("masks:", masks.shape, "ious:", ious)

    from draw import gen_image_writer, save_masks

    writer = gen_image_writer(output_dir)
    save_masks(image, [masks[int(np.argmax(ious))]], writer)
    print(f"saved to {output_dir}")


if __name__ == "__main__":
    argv = [None if a in ("", "none", "None") else a for a in sys.argv[1:]]
    main(*argv)
