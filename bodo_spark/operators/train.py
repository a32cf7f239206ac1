"""Distributed training glue (reference bodo/ai/train.py:104
torch_train -> MPI worker submission).

Spark-first re-expression: training fan-out is TorchDistributor
(pyspark.ml.torch) -- the engine's job is (a) launching the per-worker
loop and (b) feeding each worker its partition of a DataFrame as
numpy/tensor batches. The feeding seam (partitions -> contiguous numpy
blocks via Arrow) is real and tested; the actual gradient loop needs
torch, which this container does not ship, so launching raises a
clearly-marked NotImplementedError at the last step when torch is
absent.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def partition_batches(df: DataFrame, feature_cols: list[str],
                      label_col: str | None = None,
                      batch_rows: int = 1024):
    """The data-feeding seam: yield (features, labels) numpy batches per
    partition, Arrow-transferred -- exactly what a per-worker dataloader
    consumes. Returns a DataFrame of per-batch shapes (count/ncols) so
    the plumbing is assertable without torch."""
    schema = "batch_id long, n_rows long, n_cols long"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        buf: list[pd.DataFrame] = []
        n = 0
        bid = 0
        out = []

        def flush():
            nonlocal bid, buf, n
            if not buf:
                return
            block = pd.concat(buf)
            for lo in range(0, len(block), batch_rows):
                feats = np.ascontiguousarray(
                    block.iloc[lo:lo + batch_rows][feature_cols]
                    .to_numpy(dtype=np.float64))
                out.append((bid, feats.shape[0], feats.shape[1]))
                bid += 1
            buf, n = [], 0

        for pdf in batches:
            buf.append(pdf)
            n += len(pdf)
            if n >= batch_rows:
                flush()
        flush()
        yield pd.DataFrame(out, columns=["batch_id", "n_rows", "n_cols"])

    return df.select(*feature_cols,
                     *([label_col] if label_col else [])) \
        .mapInPandas(gen, schema)


def torch_train(train_loop: Callable, num_processes: int = 1,
                use_gpu: bool = False, **distributor_kwargs):
    """Launch ``train_loop`` on ``num_processes`` workers via
    TorchDistributor (the Spark-native analogue of the reference's MPI
    worker submission). Requires torch on the workers."""
    try:
        import torch  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "torch_train needs PyTorch on driver and workers; this "
            "environment does not ship torch. The TorchDistributor "
            "launch path below is the real implementation.") from e
    from pyspark.ml.torch.distributor import TorchDistributor
    dist = TorchDistributor(num_processes=num_processes,
                            local_mode=True, use_gpu=use_gpu,
                            **distributor_kwargs)
    return dist.run(train_loop)
