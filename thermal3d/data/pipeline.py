"""Input pipeline: threaded prefetching batcher feeding fixed-shape batches.

Replaces the reference's torch DataLoader(num_workers=4) + skip_none_collate
(train_thermal_dustr.py:83-86, utils/data_utils.py): since the index is
validated eagerly, batches are always full and fixed-shape — a requirement for
the jitted/sharded train step. Decoding runs in a thread pool (cv2/numpy
release the GIL); batches are prefetched ahead of the device.
"""

from __future__ import annotations

import collections
import concurrent.futures as cf

from typing import Dict, Iterator, Optional, Sequence, Tuple

import numpy as np


def split_index(n: int, val_fraction: float = 0.2, seed: int = 0
                ) -> Tuple[np.ndarray, np.ndarray]:
    """Random 0.8/0.2 split (train_thermal_dustr.py:78-81 random_split)."""
    perm = np.random.default_rng(seed).permutation(n)
    n_train = int(n * (1.0 - val_fraction))
    return perm[:n_train], perm[n_train:]


def pipelined_batches(chunks: Sequence, decode, dispatch, consume,
                      prefetch: int = 2) -> None:
    """Host-decode / device-compute / fetch overlap shared by
    `InferenceEngine.infer_paths` and `pseudo_gt.generate_pseudo_gt`.

    A single background thread decodes chunks i+1..i+prefetch while the
    device computes chunk i, and chunk i's results are consumed (fetched /
    written) only AFTER chunk i+1 has been dispatched — so decode, compute,
    and fetch all overlap while results stay in submission order.

    decode(chunk)     runs on the background thread; its return value is
                      handed to dispatch on the main thread.
    dispatch(decoded) launches device work; returns an inflight token
                      (anything identifying the async result) or None to
                      skip the chunk (e.g. every frame failed to decode).
    consume(token)    blocks on / writes out a previously dispatched token.

    One decode thread is enough: the native loader parallelizes within a
    batch, and results must be consumed in order anyway.
    """
    inflight = None
    with cf.ThreadPoolExecutor(1) as pool:
        pending: collections.deque = collections.deque(
            pool.submit(decode, c) for c in chunks[: prefetch + 1])
        next_i = len(pending)
        for _ in range(len(chunks)):
            decoded = pending.popleft().result()
            if next_i < len(chunks):
                pending.append(pool.submit(decode, chunks[next_i]))
                next_i += 1
            token = dispatch(decoded)
            if token is None:
                continue
            if inflight is not None:  # consume i-1 after dispatching i
                consume(inflight)
            inflight = token
        if inflight is not None:
            consume(inflight)


class BatchLoader:
    """Iterable over stacked numpy batches with background prefetch.

    Drops samples that fail to decode (should not happen on a validated
    index) and drops the final partial batch when drop_last (static shapes).
    """

    def __init__(self, dataset, indices: Optional[Sequence[int]] = None,
                 batch_size: int = 4, shuffle: bool = True, seed: int = 0,
                 num_workers: int = 4, prefetch: int = 2, drop_last: bool = True,
                 process_id: int = 0, process_count: int = 1):
        """batch_size is the GLOBAL batch size. With process_count > 1
        (multi-host DP — core/distributed.py), every process computes the
        same global shuffle order and process p loads only rows
        [p·B/P, (p+1)·B/P) of each global batch, so the union across
        processes reproduces the single-process batch stream exactly."""
        self.dataset = dataset
        self.indices = np.asarray(indices if indices is not None else np.arange(len(dataset)))
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.drop_last = drop_last
        self._epoch = 0
        if batch_size % process_count:
            raise ValueError(
                f"global batch size {batch_size} not divisible by "
                f"process_count {process_count}")
        if not 0 <= process_id < process_count:
            raise ValueError(f"process_id {process_id} out of range "
                             f"[0, {process_count})")
        self.process_id = process_id
        self.process_count = process_count

    def __len__(self):
        n = len(self.indices)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def local_real_count(self, bi: int) -> int:
        """Number of REAL (non-padded) samples in this process's slice of
        global batch `bi`. With drop_last=False the final global batch may
        be partial; the iterator pads every process's slice to the full
        per-process size so all processes yield the same number of
        fixed-shape batches (collective train/eval steps must stay in
        lockstep across hosts) — use this count to average over real
        samples only."""
        bs_local = self.batch_size // self.process_count
        start = bi * self.batch_size + self.process_id * bs_local
        return int(np.clip(len(self.indices) - start, 0, bs_local))

    def _epoch_order(self) -> np.ndarray:
        if not self.shuffle:
            return self.indices
        rng = np.random.default_rng(self.seed + self._epoch)
        return rng.permutation(self.indices)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = self._epoch_order()
        self._epoch += 1
        bs = self.batch_size
        n_batches = len(order) // bs if self.drop_last else -(-len(order) // bs)

        # batch-level loading (one native thread-pool decode per batch) when
        # the dataset provides it; per-sample thread mapping otherwise
        get_batch = getattr(self.dataset, "get_batch", None)

        with cf.ThreadPoolExecutor(self.num_workers) as pool:
            pending: collections.deque = collections.deque()

            bs_local = bs // self.process_count
            lo = self.process_id * bs_local

            def submit(bi):
                idxs = order[bi * bs + lo : bi * bs + lo + bs_local]
                if (not self.drop_last and self.process_count > 1
                        and len(idxs) < bs_local):
                    # partial final global batch: a high-rank process may own
                    # few or ZERO of its rows. Pad its slice with a valid
                    # index so every process still yields a full-shape batch
                    # for every global batch — otherwise processes execute
                    # different numbers of collective eval steps and the job
                    # deadlocks. local_real_count(bi) tells the consumer how
                    # many leading rows are real.
                    pad = np.broadcast_to(order[0], (bs_local - len(idxs),))
                    idxs = np.concatenate([idxs, pad])
                if get_batch is not None:
                    pending.append(pool.submit(get_batch, idxs))
                else:
                    pending.append(pool.map(self.dataset.__getitem__, idxs))

            for bi in range(min(self.prefetch + 1, n_batches)):
                submit(bi)
            next_submit = min(self.prefetch + 1, n_batches)

            for _ in range(n_batches):
                head = pending.popleft()
                raw = head.result() if get_batch is not None else head
                samples = [s for s in raw if s is not None]
                if next_submit < n_batches:
                    submit(next_submit)
                    next_submit += 1
                if not samples or (self.drop_last and len(samples) < bs_local):
                    continue
                keys = samples[0].keys()
                yield {k: np.stack([s[k] for s in samples]) for k in keys}
