"""Prefetch iterator: order, completeness, concurrency."""

import time

import numpy as np

from l4p_tpu.data.prefetch import PrefetchIterator


def test_prefetch_order_and_completeness():
    def make(i):
        time.sleep(0.01 * ((i * 7) % 3))  # jittered work
        return {"i": i, "x": np.full((4,), i)}

    items = list(PrefetchIterator(make, 20, num_threads=4, buffer=4))
    assert [it["i"] for it in items] == list(range(20))
    assert all((it["x"] == it["i"]).all() for it in items)


def test_prefetch_overlaps_work():
    def make(i):
        time.sleep(0.05)
        return {"i": i}

    t0 = time.time()
    list(PrefetchIterator(make, 8, num_threads=4, buffer=8))
    elapsed = time.time() - t0
    assert elapsed < 8 * 0.05  # strictly faster than serial


def test_prefetch_early_close():
    it = PrefetchIterator(lambda i: {"i": i}, 100, num_threads=2, buffer=2)
    gen = iter(it)
    assert next(gen)["i"] == 0
    it.close()  # no hang, threads exit
