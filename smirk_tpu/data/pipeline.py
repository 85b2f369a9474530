"""Batching pipeline: mixed-quota sampler + threaded prefetch loader.

Replaces the reference's torch DataLoader + MixedDatasetBatchSampler
(datasets/mixed_dataset_sampler.py, data_utils.py:30-57): per-batch fixed
quotas per dataset drawn with replacement, None samples dropped, threaded
workers keeping a prefetch queue full, yielding fixed-shape numpy dicts
ready for jax.device_put.
"""
from __future__ import annotations

import os
import queue
import threading
from typing import Dict, List, Optional, Sequence

import numpy as np


class MixedDatasetSampler:
    """Per-batch quotas from dataset ratios (mixed_dataset_sampler.py:7-55)."""

    def __init__(self, dataset_sizes: Sequence[int], ratios: Sequence[float],
                 batch_size: int, n_samples: int, seed: int = 0,
                 process_index: int = 0, process_count: int = 1):
        """Multi-host SPMD: each process draws its own per-host batch slice
        (seeded by process_index) of the global batch; `batch_size` here is
        the PER-HOST batch."""
        sizes = [s for s in dataset_sizes]
        ratios = np.asarray(ratios, np.float64)
        ratios = ratios / ratios.sum()
        per_batch = np.floor(ratios * batch_size).astype(int)
        per_batch[0] = batch_size - per_batch[1:].sum()
        self.sizes = sizes
        self.per_batch = per_batch
        self.n_batches = n_samples // (batch_size * process_count)
        self.rng = np.random.default_rng(seed * 7919 + process_index)

    def __len__(self):
        return self.n_batches

    def __iter__(self):
        offsets = np.cumsum([0] + list(self.sizes[:-1]))
        cols = []
        for size, pb, off in zip(self.sizes, self.per_batch, offsets):
            if pb == 0:
                continue
            if size == 0:
                # silently dropping the quota would shrink every batch below
                # batch_size and break fixed-shape jit downstream
                raise ValueError(
                    f"dataset with per-batch quota {pb} is empty; fix the "
                    "ratios or the dataset path"
                )
            cols.append(
                off + self.rng.integers(0, size, (self.n_batches, pb))
            )
        idx = np.concatenate(cols, axis=1)
        for row in idx:
            yield row.tolist()


class ConcatDataset:
    def __init__(self, datasets: List):
        self.datasets = datasets
        self.cum = np.cumsum([len(d) for d in datasets])

    def __len__(self):
        return int(self.cum[-1]) if len(self.cum) else 0

    def __getitem__(self, i):
        d = int(np.searchsorted(self.cum, i, side="right"))
        prev = 0 if d == 0 else int(self.cum[d - 1])
        return self.datasets[d][i - prev]


def collate(samples: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    """Stack samples; temporal windows (img ndim 4, see VideoFrameDataset)
    are folded into the batch axis -> (sum K_i, ...). Mixed window/frame
    batches stay rectangular: single frames become K=1 windows."""
    samples = [s for s in samples if s is not None]
    if not samples:
        return None  # loader skips fully-bad batches
    keys = samples[0].keys()
    if all(np.asarray(s["img"]).ndim == 3 for s in samples):
        return {k: np.stack([np.asarray(s[k]) for s in samples])
                for k in keys}
    # whether each SAMPLE is a window is decided once, from img rank —
    # per-key rank comparison misfolds all-window batches (every key's
    # min rank is then the window rank and no sample gets the K axis)
    is_window = [np.asarray(s["img"]).ndim == 4 for s in samples]
    out = {}
    for k in keys:
        arrs = [np.asarray(s[k]) for s in samples]
        arrs = [a if w else a[None] for a, w in zip(arrs, is_window)]
        out[k] = np.concatenate(arrs, axis=0)
    return out


class DataLoader:
    """Threaded prefetch loader over a dataset + batch sampler."""

    def __init__(self, dataset, batch_sampler, num_workers: int = 4,
                 prefetch: int = 4):
        self.dataset = dataset
        self.batch_sampler = batch_sampler
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch

    def __len__(self):
        return len(self.batch_sampler)

    def __iter__(self):
        batches = list(iter(self.batch_sampler))
        task_q: "queue.Queue" = queue.Queue()
        results: Dict[int, Optional[Dict]] = {}
        cond = threading.Condition()
        errors: List[BaseException] = []
        # bounds (in-flight + uncollected) batches so workers cannot race an
        # entire epoch into memory; acquired BEFORE taking a task, so the
        # oldest outstanding batch always holds a permit (no deadlock)
        permits = threading.Semaphore(max(1, self.prefetch) + self.num_workers)

        for i, b in enumerate(batches):
            task_q.put((i, b))

        def worker():
            while True:
                permits.acquire()
                try:
                    i, idxs = task_q.get_nowait()
                except queue.Empty:
                    permits.release()
                    return
                try:
                    batch = collate([self.dataset[j] for j in idxs])
                except BaseException as e:  # propagate with the real cause
                    with cond:
                        errors.append(e)
                        cond.notify_all()
                    return
                with cond:
                    results[i] = batch
                    cond.notify_all()

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for t in threads:
            t.start()

        served = 0
        while served < len(batches):
            with cond:
                while (served not in results and not errors
                       and any(t.is_alive() for t in threads)):
                    cond.wait(0.1)
                if errors:
                    raise RuntimeError(
                        f"loader worker failed on batch {served}"
                    ) from errors[0]
                if served not in results:
                    raise RuntimeError("loader workers died early")
                batch = results.pop(served)
            permits.release()
            served += 1
            if batch is not None:  # None = every sample in the batch was bad
                yield batch


class SimpleBatchSampler:
    def __init__(self, n: int, batch_size: int, shuffle=False, seed=0,
                 drop_last=True):
        self.n, self.bs, self.shuffle, self.seed = n, batch_size, shuffle, seed
        self.drop_last = drop_last
        self._epoch = 0

    def __len__(self):
        return self.n // self.bs if self.drop_last else -(-self.n // self.bs)

    def __iter__(self):
        idx = np.arange(self.n)
        if self.shuffle:
            # fresh permutation per epoch (torch DataLoader semantics);
            # still deterministic given (seed, epoch index)
            epoch = self._epoch
            self._epoch += 1
            np.random.default_rng((self.seed, epoch)).shuffle(idx)
        for i in range(len(self)):
            yield idx[i * self.bs:(i + 1) * self.bs].tolist()


def load_dataloaders(config, synthetic: bool = False):
    """Build (train_loader, val_loader) like reference data_utils.py:11-59.

    With synthetic=True (or when no dataset paths exist) uses the procedural
    dataset — the zero-external-data path for smoke training.
    """
    from smirk_tpu.data import datasets as D

    if synthetic:
        # SMIRK_SYNTH_LEN sizes the procedural epoch (default 4 batches):
        # long validation runs want many steps per epoch, not many epochs
        # (every epoch end writes a full-TrainState checkpoint, and D2H
        # through the dev tunnel is slow — see PARITY.md)
        synth_len = int(os.environ.get("SMIRK_SYNTH_LEN", "0"))
        train = D.SyntheticFaceDataset(config, length=synth_len or max(
            64, config.train.batch_size * 4))
        val = D.SyntheticFaceDataset(config, length=config.train.batch_size * 2,
                                     test=True, seed=1)
        train_loader = DataLoader(
            train,
            SimpleBatchSampler(len(train), config.train.batch_size, True),
            num_workers=config.train.num_workers,
        )
        val_loader = DataLoader(
            val, SimpleBatchSampler(len(val), config.train.batch_size),
            num_workers=config.train.num_workers,
        )
        return train_loader, val_loader

    d = config.dataset
    parts, ratios, val_parts = [], [], []
    ffhq = D.FFHQDataset(config)
    if len(ffhq):
        parts.append(ffhq)
        ratios.append(d.FFHQ_percentage)
    celeba = D.CelebADataset(config)
    if len(celeba):
        parts.append(celeba)
        ratios.append(d.CelebA_percentage)
    mead_tr, mead_va, _ = D.get_mead_items(config)
    if mead_tr:
        parts.append(D.VideoFrameDataset(config, mead_tr))
        ratios.append(d.MEAD_percentage)
        val_parts.append(D.VideoFrameDataset(config, mead_va, test=True))
    sides_tr, _, _ = D.get_mead_sides_items(config)
    if sides_tr:
        parts.append(D.VideoFrameDataset(config, sides_tr))
        ratios.append(d.MEAD_sides_percentage)
    try:
        tr, va, te = D.get_lrs3_items(
            d.LRS3_path, d.LRS3_landmarks_path, "assets/LRS3_lists.pkl"
        )
        parts.insert(0, D.VideoFrameDataset(
            config, tr, temporal=d.LRS3_temporal_sampling))
        ratios.insert(0, d.LRS3_percentage)
        val_parts.insert(0, D.VideoFrameDataset(config, va, test=True))
    except FileNotFoundError:
        pass
    val_ds = ConcatDataset(val_parts) if val_parts else None
    if not parts:
        raise FileNotFoundError(
            "no dataset paths found; pass synthetic=True for the "
            "zero-data pipeline"
        )
    train = ConcatDataset(parts)
    try:
        import jax

        pidx, pcount = jax.process_index(), jax.process_count()
    except Exception:
        pidx, pcount = 0, 1
    sampler = MixedDatasetSampler(
        [len(p) for p in parts], ratios, config.train.batch_size,
        config.train.samples_per_epoch,
        process_index=pidx, process_count=pcount,
    )
    # Temporal windows (K>1) are folded into the batch axis by collate, so
    # the jitted step sees B + n_lrs3*(K-1) frames, not config batch_size.
    # That effective batch must still divide the data-mesh axis, and the
    # silent change of compiled batch size is worth a loud log line.
    k = int(getattr(config, "K", 1) or 1)
    if d.LRS3_temporal_sampling and k > 1 and parts and isinstance(
            parts[0], D.VideoFrameDataset) and parts[0].K > 1:
        n_lrs3 = int(sampler.per_batch[0])
        effective = config.train.batch_size + n_lrs3 * (k - 1)
        try:
            import jax

            n_dev = max(1, jax.device_count() // pcount)
        except Exception:
            n_dev = 1
        if effective % n_dev != 0:
            raise ValueError(
                f"temporal sampling (K={k}) folds {n_lrs3} LRS3 windows "
                f"into an effective per-host batch of {effective} frames, "
                f"which does not divide the {n_dev}-device data mesh; "
                f"adjust batch_size/K/LRS3_percentage"
            )
        print(f"[data] LRS3 temporal K={k}: effective per-host batch = "
              f"{effective} frames ({n_lrs3} windows + "
              f"{config.train.batch_size - n_lrs3} single frames)")
    train_loader = DataLoader(train, sampler, config.train.num_workers)
    val_loader = None
    if val_ds is not None:
        val_loader = DataLoader(
            val_ds,
            SimpleBatchSampler(len(val_ds), config.train.batch_size),
            config.train.num_workers,
        )
    return train_loader, val_loader
