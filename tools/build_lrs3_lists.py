"""One-time LRS3 train/val/test list builder (reference
datasets/data_utils.py:105-147): scans <lrs3>/trainval + /test, validates
FAN pkl tracks + mediapipe npy presence, 80/20 trainval split (seed 42).

Usage: python tools/build_lrs3_lists.py <lrs3_path> <landmarks_path> [out.pkl]
"""
import os
import pickle
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from smirk_tpu.data.tracks import landmarks_interpolate  # noqa: E402


def gather(lrs3_path, landmarks_path, folders, split):
    items = []
    for folder in folders:
        fdir = os.path.join(lrs3_path, split, folder)
        for file in os.listdir(fdir):
            if not file.endswith(".txt"):
                continue
            stem = f"{split}/{folder}/{file.split('.')[0]}"
            fan_p = os.path.join(landmarks_path, stem + ".pkl")
            mp_p = os.path.join(lrs3_path, stem + ".npy")
            if not (os.path.exists(fan_p) and os.path.exists(mp_p)):
                continue
            with open(fan_p, "rb") as fh:
                if landmarks_interpolate(pickle.load(fh)) is None:
                    continue
            items.append(
                (os.path.join(lrs3_path, stem + ".mp4"), fan_p, mp_p, folder)
            )
    return items


def main():
    lrs3_path, landmarks_path = sys.argv[1], sys.argv[2]
    out = sys.argv[3] if len(sys.argv) > 3 else "assets/LRS3_lists.pkl"
    # reference split (data_utils.py:105-110): sklearn train_test_split
    # with random_state=42 over the raw (unsorted) listdir — reproduce it
    # exactly so train/val membership matches reference-trained runs
    trainval = list(os.listdir(os.path.join(lrs3_path, "trainval")))
    try:
        from sklearn.model_selection import train_test_split

        train_f, val_f = train_test_split(trainval, test_size=0.2,
                                          random_state=42)
    except ImportError:  # deterministic fallback (split differs from ref)
        trainval = sorted(trainval)
        rng = random.Random(42)
        rng.shuffle(trainval)
        n_val = int(0.2 * len(trainval))
        val_f, train_f = trainval[:n_val], trainval[n_val:]
    test_f = sorted(os.listdir(os.path.join(lrs3_path, "test")))
    lists = [
        gather(lrs3_path, landmarks_path, train_f, "trainval"),
        gather(lrs3_path, landmarks_path, val_f, "trainval"),
        gather(lrs3_path, landmarks_path, test_f, "test"),
    ]
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "wb") as f:
        pickle.dump(lists, f)
    print("wrote", out, [len(x) for x in lists])


if __name__ == "__main__":
    main()
