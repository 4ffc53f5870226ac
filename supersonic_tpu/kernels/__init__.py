"""Pallas TPU kernels (interpret-mode capable on the CPU backend).

``FORCE_KERNEL_PATHS``: test hook.  The operator-side routing glue
(ops/merge._merge_via_kernel, ops/filter._compact_via_kernel,
ops/hash_join._try_spread_expansion) normally returns None on the CPU
backend / below the profitable size, which means the reassembly glue —
word split/recombine, validity lanes, spec bookkeeping — would only ever
execute on real hardware.  Setting this True forces those routes on
(kernels run in interpret mode on CPU) so CI exercises the full glue.
"""

FORCE_KERNEL_PATHS = False


def force_kernel_paths() -> bool:
    return FORCE_KERNEL_PATHS
