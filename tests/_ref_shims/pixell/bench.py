"""Minimal ``pixell.bench``: `with bench.show("..."):` timing context."""
import contextlib
import time


@contextlib.contextmanager
def show(name="bench"):
    t0 = time.perf_counter()
    yield
    print(f"{name}: {time.perf_counter() - t0:.4f} s")


mark = show
