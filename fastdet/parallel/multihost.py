"""Multi-host helpers: eval-metric gathering and input sharding.

On a multi-host slice each process feeds and evaluates its own shard of
the dataset; `gather_eval_stats` all-gathers the per-host detection
statistics so every host computes identical global (P, R, mAP, F1)
(SURVEY.md §5's eval-gather requirement).  Degenerates to identity on a
single process.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def process_shard(n_items: int) -> Tuple[int, int]:
    """[start, end) of this host's contiguous shard of a dataset."""
    import jax
    pid, n = jax.process_index(), jax.process_count()
    per = (n_items + n - 1) // n
    start = min(pid * per, n_items)
    return start, min(start + per, n_items)


def gather_eval_stats(stats: Sequence[Tuple[np.ndarray, np.ndarray, np.ndarray]],
                      labels: Sequence[float]):
    """All-gather per-host (tp, conf, cls) stat tuples + GT label lists.

    Returns (all_stats, all_labels) with every host's contributions; on a
    single process this is the identity."""
    import jax
    if jax.process_count() == 1:
        return list(stats), list(labels)

    from jax.experimental import multihost_utils

    # pack ragged stats into one float array + lengths for the gather
    flat = [np.concatenate([s[0], s[1], s[2]]) for s in stats]
    lens = np.asarray([len(s[0]) for s in stats], np.int32)
    payload = {
        "stats": np.concatenate(flat) if flat else np.zeros(0, np.float64),
        "lens": lens,
        "labels": np.asarray(labels, np.float64),
    }
    gathered = multihost_utils.process_allgather(payload)

    all_stats: List = []
    all_labels: List[float] = []
    for h in range(len(gathered["lens"])):
        offs = 0
        buf = np.asarray(gathered["stats"][h])
        for n in np.asarray(gathered["lens"][h]):
            n = int(n)
            tp = buf[offs:offs + n]
            conf = buf[offs + n:offs + 2 * n]
            cls = buf[offs + 2 * n:offs + 3 * n]
            all_stats.append((tp, conf, cls))
            offs += 3 * n
        all_labels.extend(np.asarray(gathered["labels"][h]).tolist())
    return all_stats, all_labels
