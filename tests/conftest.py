import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    """ONE Ray session for the whole pytest run (only tests that need Ray request it)."""
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield ray
    ray.shutdown()


def entries(*triples):
    """Build (ts, value, validity) numpy arrays from (ts, value, validity) triples."""
    import numpy as np

    if not triples:
        return (
            np.zeros(0, dtype=np.int64),
            np.zeros(0, dtype=np.float64),
            np.zeros(0, dtype=np.int64),
        )
    ts, value, validity = zip(*triples)
    return (
        np.array(ts, dtype=np.int64),
        np.array(value),
        np.array(validity, dtype=np.int64),
    )


def as_triples(ts, value, validity):
    return [(int(t), v if isinstance(v, str) else float(v), int(d)) for t, v, d in zip(ts, value, validity)]
