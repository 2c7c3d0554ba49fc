"""Training example: generate a tiny synthetic dataset and fine-tune skyeye_s.

(The reference ships examples/training_example.py zero-byte; SURVEY.md §8#15.)
Run:  python examples/training_example.py
"""
from pathlib import Path

import numpy as np
import yaml


def make_dataset(root: Path, n_train: int = 24, n_val: int = 8, size: int = 320):
    import cv2

    rng = np.random.default_rng(0)
    for split, n in [("train", n_train), ("val", n_val)]:
        (root / f"images/{split}").mkdir(parents=True, exist_ok=True)
        (root / f"labels/{split}").mkdir(parents=True, exist_ok=True)
        for i in range(n):
            img = np.full((size, size, 3), 30, np.uint8)
            rows = []
            for _ in range(int(rng.integers(1, 4))):
                bw, bh = int(rng.integers(30, 80)), int(rng.integers(30, 80))
                x1 = int(rng.integers(0, size - bw))
                y1 = int(rng.integers(0, size - bh))
                cls = int(rng.integers(0, 2))
                color = [(250, 60, 60), (60, 250, 60)][cls]
                cv2.rectangle(img, (x1, y1), (x1 + bw, y1 + bh), color, -1)
                rows.append(
                    f"{cls} {(x1 + bw / 2) / size:.6f} {(y1 + bh / 2) / size:.6f} "
                    f"{bw / size:.6f} {bh / size:.6f}"
                )
            cv2.imwrite(str(root / f"images/{split}/{split}{i:03d}.jpg"), img)
            (root / f"labels/{split}/{split}{i:03d}.txt").write_text("\n".join(rows))
    (root / "data.yaml").write_text(yaml.safe_dump({
        "path": str(root), "train": "images/train", "val": "images/val",
        "nc": 2, "names": ["red", "green"],
    }))
    return root / "data.yaml"


def main():
    from skyeye_tpu.cli.train import train

    data_yaml = make_dataset(Path("/tmp/skyeye_example_data"))
    results, save_dir = train(
        cfg="skyeye_s",
        data=str(data_yaml),
        epochs=5,
        batch_size=8,
        img_size=320,
        project="runs/example_train",
        name="exp",
    )
    print(f"finished; weights in {save_dir}/weights, final results {results[:4]}")


if __name__ == "__main__":
    main()
