"""Pure batch kernels (numpy / pyarrow) implementing the reference semantics.

Every kernel is a ``Table -> Table`` (or arrays -> arrays) function directly usable
inside ``ray.data.Dataset.map_batches(batch_format="pyarrow")``. Kernels are
*segment-vectorized*: one call processes MANY series at once — rows must be sorted by
``(source, ts)`` and a segment-id array marks series boundaries. No Ray imports here.
"""
