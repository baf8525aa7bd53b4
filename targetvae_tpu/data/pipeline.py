"""Host-side data feed: background shuffle -> gather -> device prefetch.

For datasets that fit in HBM the Trainer keeps everything on device and scans
whole epochs (train/loop.py). This pipeline covers the streaming case —
EMPIAR-scale particle stacks larger than device memory: a worker thread
assembles shuffled batches on host (using the native multithreaded gather when
available) and stages them onto the device (with an optional NamedSharding)
while the previous step computes.

Replaces the reference's device-resident TensorDataset + in-process DataLoader
(train_mnist.py:495-500, :586-587) for the large-data regime.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Tuple

import numpy as np


class HostDataPipeline:
    def __init__(self, images: np.ndarray, ctf: Optional[np.ndarray] = None,
                 batch_size: int = 100, seed: int = 0,
                 sharding=None, prefetch: int = 2, shuffle: bool = True,
                 multihost: Optional[bool] = None):
        """multihost: every process runs the same pipeline (same seed -> same
        global permutation over the FULL dataset, which each host loads — MRC
        reads are mmap'd so this is cheap) but gathers only the rows owned by
        its addressable devices; the global batch array is assembled with
        jax.make_array_from_process_local_data so DP batches span hosts
        without any host ever staging foreign rows. Defaults to auto-detect
        (jax.process_count() > 1). Requires a sharding; partial trailing
        batches are dropped in this mode (their row split would be uneven)."""
        self.images = np.ascontiguousarray(images, dtype=np.float32)
        self.ctf = None if ctf is None else np.ascontiguousarray(
            ctf, dtype=np.float32)
        self.batch = batch_size
        self.seed = seed
        self.sharding = sharding
        self.prefetch = max(1, prefetch)
        self.shuffle = shuffle
        self.multihost = multihost

    def __len__(self) -> int:
        return len(self.images)

    def _local_rows(self, batch: int) -> Optional[np.ndarray]:
        """Global-batch row indices owned by this process's devices."""
        import jax

        mh = self.multihost
        if mh is None:
            mh = jax.process_count() > 1
        if not mh:
            return None
        if self.sharding is None:
            raise ValueError("multihost streaming requires a sharding")
        gshape = (batch,) + self.images.shape[1:]
        rows = []
        for sl in self.sharding.addressable_devices_indices_map(
                gshape).values():
            start, stop_, step = sl[0].indices(batch)
            # make_array_from_process_local_data expects this process's rows
            # to be the sorted concatenation of unit-stride per-device ranges;
            # a strided/interleaved batch sharding would silently feed wrong
            # rows, so refuse it outright.
            assert step == 1, (
                f"multihost streaming requires unit-stride batch sharding, "
                f"got step={step} in {sl[0]}")
            rows.append(np.arange(start, stop_))
        return np.unique(np.concatenate(rows))

    def epoch(self, epoch_idx: int = 0) -> Iterator[Tuple]:
        """Yield (y_device, ctf_device_or_None) batches for one epoch."""
        import jax

        from .native import gather_f32

        n = len(self.images)
        rng = np.random.RandomState(self.seed + epoch_idx)
        order = rng.permutation(n) if self.shuffle else np.arange(n)
        local_rows = self._local_rows(self.batch)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put(batch_np, ctf_np):
            if local_rows is None:
                y = jax.device_put(batch_np, self.sharding)
                c = None if ctf_np is None else jax.device_put(ctf_np,
                                                               self.sharding)
            else:
                mk = jax.make_array_from_process_local_data
                y = mk(self.sharding, batch_np,
                       (self.batch,) + batch_np.shape[1:])
                c = None if ctf_np is None else mk(
                    self.sharding, ctf_np, (self.batch,) + ctf_np.shape[1:])
            q.put((y, c))

        def worker():
            try:
                for lo in range(0, n, self.batch):
                    if stop.is_set():
                        return
                    idx = order[lo:lo + self.batch]
                    if local_rows is not None:
                        if len(idx) < self.batch:
                            break  # uneven trailing batch: drop in multihost
                        idx = idx[local_rows]
                    batch_np = gather_f32(self.images, idx)
                    ctf_np = None if self.ctf is None else gather_f32(
                        self.ctf, idx)
                    put(batch_np, ctf_np)
            finally:
                q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
        finally:
            stop.set()
