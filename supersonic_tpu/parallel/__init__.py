"""Distributed execution over a TPU device mesh (SURVEY.md §2.9, §5.8)."""
from .dist import (AXIS, check_exchange_overflow, collect_table,
                   combine_specification, dist_group_aggregate,
                   dist_hash_join, dist_hash_join_ring, dist_hash_join_skew,
                   dist_map, dist_sort, distribute_table, make_mesh,
                   run_local_plan, shuffle)
from .hashing import combine_hash, partition_of
from .multihost import global_mesh, initialize, is_multihost


def dryrun(n_devices: int) -> None:
    """Jit + execute one step of the full distributed pipeline
    (filter -> join -> group-by -> sort) on tiny shapes over an
    n-device mesh.  Used by the driver's multi-chip dry run."""
    import jax
    import numpy as np

    from .. import (AggSpec, Aggregation, Const, DataType, Filter,
                    JoinType, KeyUniqueness, ScanTable, Table, TupleSchema,
                    col)
    from .dist import make_mesh

    mesh = make_mesh(n_devices)
    rng = np.random.default_rng(0)
    n, m = 64, 16
    fact = Table.from_data(
        TupleSchema.of(("fk", DataType.INT32, False),
                       ("v", DataType.FLOAT, False)),
        {"fk": rng.integers(0, m, n, dtype=np.int32),
         "v": rng.random(n, dtype=np.float32)})
    dim = Table.from_data(
        TupleSchema.of(("pk", DataType.INT32, False),
                       ("g", DataType.INT32, False)),
        {"pk": np.arange(m, dtype=np.int32),
         "g": rng.integers(0, 4, m, dtype=np.int32)})
    dfact = distribute_table(fact, mesh)
    ddim = distribute_table(dim, mesh, keys=["pk"])

    def step(dfact, ddim):
        filtered = dist_map(
            mesh,
            lambda t: run_local_plan(
                lambda tt: Filter(col("v") > Const(0.25, DataType.FLOAT),
                                  ScanTable(tt)), t),
            dfact)
        joined = dist_hash_join(
            mesh, JoinType.INNER, ["fk"], ["pk"], filtered, ddim,
            KeyUniqueness.UNIQUE, out_cap_per_peer=n)
        agg = dist_group_aggregate(
            mesh, joined, ["g"],
            [AggSpec(Aggregation.SUM, "v", "sv"),
             AggSpec(Aggregation.COUNT, None, "c")],
            out_cap_per_peer=n)
        out = dist_sort(mesh, agg, ["g"], out_cap_per_peer=n)
        return out

    out = jax.jit(step)(dfact, ddim)
    jax.block_until_ready(jax.tree_util.tree_leaves(out))
    total = int(np.sum(np.asarray(out.num_rows)))
    assert total >= 1, "distributed pipeline produced no rows"
