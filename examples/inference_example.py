"""Inference example: hub-style API and the tiled high-resolution path.

(The reference ships examples/inference_example.py zero-byte; SURVEY.md §8#15.)
Run:  python examples/inference_example.py [image_or_dir ...]
"""
import sys

import numpy as np


def main():
    from skyeye_tpu import SkyEyeDetector

    sources = sys.argv[1:]
    if not sources:
        # synthesize a demo frame when no input is given
        import cv2

        frame = np.full((720, 1280, 3), 40, np.uint8)
        cv2.rectangle(frame, (200, 200), (320, 320), (60, 60, 250), -1)
        cv2.rectangle(frame, (700, 400), (820, 500), (60, 250, 60), -1)
        cv2.imwrite("/tmp/skyeye_demo.jpg", frame)
        sources = ["/tmp/skyeye_demo.jpg"]

    # weights can be a torch .pt, an orbax checkpoint dir, or a variant name
    model = SkyEyeDetector(weights=None, cfg="skyeye_s", num_classes=10,
                           img_size=640, conf_thres=0.25)
    results = model(sources)
    results.print()
    print(results.pandas()[0])
    results.save("runs/example")

    # tiled inference over a large frame (throughput mode for 4K drone video)
    import jax.numpy as jnp

    from skyeye_tpu.ops.tiling import detect_tiled

    big = np.zeros((1, 1280, 2560, 3), np.uint8)
    det, n = detect_tiled(model.module, model.variables, model.config.anchors,
                          jnp.asarray(big), tile=1280, overlap=0.2)
    print(f"tiled pipeline: {int(n[0])} detections over {big.shape[2]}px frame")


if __name__ == "__main__":
    main()
