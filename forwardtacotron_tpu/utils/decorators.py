"""Resilience decorators (parity: utils/decorators.py:6-25 in the reference).

`ignore_exception` keeps TensorBoard plot/sample generation from ever
killing a training run; `time_it` is a simple wall-clock profiler.
"""
from __future__ import annotations

import traceback
from time import time
from typing import Callable


def ignore_exception(f: Callable) -> Callable:
    def apply_func(*args, **kwargs):
        try:
            return f(*args, **kwargs)
        except Exception:
            print(f'Caught exception in {f}:')
            traceback.print_exc()
            return None
    return apply_func


def time_it(f: Callable) -> Callable:
    def apply_func(*args, **kwargs):
        t_start = time()
        result = f(*args, **kwargs)
        dur = round(time() - t_start, ndigits=2)
        print(f'{f} took {dur}s')
        return result
    return apply_func
