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

    # pack ragged stats into one float array + lengths
    # float32 throughout: process_allgather ships via device arrays and
    # would silently downcast float64 anyway (x64 disabled); tp/cls are
    # small ints and conf is float32-native
    flat = [np.concatenate([np.asarray(s[0], np.float32),
                            np.asarray(s[1], np.float32),
                            np.asarray(s[2], np.float32)]) for s in stats]
    buf = np.concatenate(flat) if flat else np.zeros(0, np.float32)
    lens = np.asarray([len(s[0]) for s in stats], np.int32)
    labs = np.asarray(labels, np.float32)

    # process_allgather requires IDENTICAL shapes on every host, but the
    # per-host payloads are ragged: gather the sizes first, pad each
    # array to the cross-host max, gather, then slice back per host.
    sizes = np.asarray([buf.size, lens.size, labs.size], np.int32)
    all_sizes = np.asarray(multihost_utils.process_allgather(sizes))
    mb, ml, mg = all_sizes.max(axis=0)

    def pad(a, n):
        return np.concatenate([a, np.zeros(int(n) - a.size, a.dtype)])

    gathered = multihost_utils.process_allgather({
        "stats": pad(buf, mb), "lens": pad(lens, ml), "labels": pad(labs, mg),
    })

    all_stats: List = []
    all_labels: List[float] = []
    for h in range(all_sizes.shape[0]):
        hbuf = np.asarray(gathered["stats"][h])
        hlens = np.asarray(gathered["lens"][h])[:int(all_sizes[h, 1])]
        offs = 0
        for n in hlens:
            n = int(n)
            tp = hbuf[offs:offs + n]
            conf = hbuf[offs + n:offs + 2 * n]
            cls = hbuf[offs + 2 * n:offs + 3 * n]
            all_stats.append((tp, conf, cls))
            offs += 3 * n
        all_labels.extend(
            np.asarray(gathered["labels"][h])[:int(all_sizes[h, 2])].tolist())
    return all_stats, all_labels
