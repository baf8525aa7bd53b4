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
from typing import Iterator, NamedTuple, Optional

import numpy as np


class StreamBatch(NamedTuple):
    """One staged device batch. Every batch arrives at the fixed batch size
    with a row-weight vector: uniform 1/B on full batches, and on a ragged
    epoch tail 1/n_real over the real rows with ZERO-weight wrap-around pad
    rows (reference drop_last=False semantics, train_mnist.py:586-587).
    Because the weights are always present, an entire streamed epoch — tail
    included — runs through ONE compiled step: no tail retrace, the Pallas
    kernel shard_map path stays live on meshes (instead of the
    activation-all-gathering GSPMD fallback), and in multihost mode the
    row split over processes stays even (nothing is dropped)."""

    y: object                 # (B, H, W, C) device array
    ctf: Optional[object]     # (B, H, W) device array or None
    w: object                 # f32 (B,), sums to 1 over the global batch
    n_real: int               # rows holding real data (== B except the tail)


class HostDataPipeline:
    def __init__(self, images: np.ndarray, ctf: Optional[np.ndarray] = None,
                 batch_size: int = 100, seed: int = 0,
                 sharding=None, prefetch: int = 2, shuffle: bool = True,
                 multihost: Optional[bool] = None,
                 wire_dtype: Optional[str] = None):
        """multihost: every process runs the same pipeline (same seed -> same
        global permutation over the FULL dataset, which each host loads — MRC
        reads are mmap'd so this is cheap) but gathers only the rows owned by
        its addressable devices; the global batch array is assembled with
        jax.make_array_from_process_local_data so DP batches span hosts
        without any host ever staging foreign rows. Defaults to auto-detect
        (jax.process_count() > 1). Requires a sharding; the zero-weight tail
        padding keeps the trailing batch's row split even, so every row of
        every epoch is processed in this mode too.

        wire_dtype: 'bfloat16' stages y and CTF batches to the device as
        bf16, HALVING the exposed host->device bytes — the fix for
        bandwidth-starved links where the H2D transfer (not the gather)
        bottlenecks streaming (VERDICT r4 #1); the cast runs in the worker
        thread, overlapped with device compute. None/'float32' = f32 wire."""
        self.images = np.ascontiguousarray(images, dtype=np.float32)
        self.ctf = None if ctf is None else np.ascontiguousarray(
            ctf, dtype=np.float32)
        self.batch = batch_size
        self.seed = seed
        self.sharding = sharding
        self.prefetch = max(1, prefetch)
        self.shuffle = shuffle
        self.multihost = multihost
        if wire_dtype in (None, "float32"):
            self.wire_dtype = None
        elif wire_dtype == "bfloat16":
            import ml_dtypes
            self.wire_dtype = np.dtype(ml_dtypes.bfloat16)
        else:
            raise ValueError(f"unsupported wire_dtype {wire_dtype!r}")

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

    def _weight_sharding(self):
        """1-D sharding for the tail weight vector: the batch sharding's
        leading-axis spec (w rides next to y through the loss shard_map)."""
        if self.sharding is None:
            return None
        spec = getattr(self.sharding, "spec", None)
        if spec is None:          # non-Named sharding: let jit reshard
            return None
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        return NamedSharding(self.sharding.mesh,
                             P(spec[0] if len(spec) else None))

    def epoch(self, epoch_idx: int = 0) -> Iterator[StreamBatch]:
        """Yield StreamBatch(y, ctf, w, n_real) device batches for one epoch.
        All batches have the fixed `batch_size` leading dim; a ragged tail is
        wrap-around padded with ZERO-weight rows (see StreamBatch)."""
        import jax

        from .native import gather_f32

        n = len(self.images)
        rng = np.random.RandomState(self.seed + epoch_idx)
        order = rng.permutation(n) if self.shuffle else np.arange(n)
        local_rows = self._local_rows(self.batch)
        w_sharding = self._weight_sharding()
        if local_rows is not None and w_sharding is None:
            # fail at epoch start with a clear message, not inside
            # make_array_from_process_local_data on the first batch
            raise ValueError(
                "multihost streaming requires a NamedSharding (needed to "
                f"derive the weight vector's 1-D sharding), got "
                f"{type(self.sharding).__name__}")
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        worker_err = []

        def put(item):
            # bounded-wait put so a closed consumer (stop set, queue full)
            # can never leave the worker thread blocked forever
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return
                except queue.Full:
                    continue

        def stage(batch_np, ctf_np, w_np, n_real):
            if local_rows is None:
                y = jax.device_put(batch_np, self.sharding)
                c = None if ctf_np is None else jax.device_put(ctf_np,
                                                               self.sharding)
                w = None if w_np is None else jax.device_put(w_np, w_sharding)
            else:
                mk = jax.make_array_from_process_local_data
                y = mk(self.sharding, batch_np,
                       (self.batch,) + batch_np.shape[1:])
                c = None if ctf_np is None else mk(
                    self.sharding, ctf_np, (self.batch,) + ctf_np.shape[1:])
                w = None if w_np is None else mk(w_sharding, w_np,
                                                 (self.batch,))
            put(StreamBatch(y, c, w, n_real))

        def worker():
            try:
                for lo in range(0, n, self.batch):
                    if stop.is_set():
                        return
                    idx = order[lo:lo + self.batch]
                    rem = len(idx)
                    w_np = np.zeros(self.batch, np.float32)
                    w_np[:rem] = 1.0 / rem
                    if rem < self.batch:
                        # zero-weight wrap-around padding to the fixed batch
                        # size: same compiled step as the full batches, even
                        # multihost row split, loss/metrics equal to the
                        # unpadded tail's batch means (train/loop._pad_tail's
                        # weight contract)
                        idx = np.resize(idx, self.batch)
                    if local_rows is not None:
                        idx = idx[local_rows]
                        w_np = w_np[local_rows]
                    batch_np = gather_f32(self.images, idx)
                    ctf_np = None if self.ctf is None else gather_f32(
                        self.ctf, idx)
                    if self.wire_dtype is not None:
                        batch_np = batch_np.astype(self.wire_dtype)
                        if ctf_np is not None:
                            ctf_np = ctf_np.astype(self.wire_dtype)
                    stage(batch_np, ctf_np, w_np, rem)
            except BaseException as e:   # surfaced to the consumer: a crash
                worker_err.append(e)     # must not look like a short epoch
            finally:
                put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    if worker_err:
                        raise RuntimeError(
                            "HostDataPipeline worker failed mid-epoch"
                        ) from worker_err[0]
                    break
                yield item
        finally:
            stop.set()
