from .base import (BindContext, BoundOperation, CancellationToken,
                   Interrupted, Operation, RunContext, bind_plan,
                   compile_plan, execute, set_debug_checks)
from .scan import (ScanTable, ScanTableWithSelection, ScanView,
                   ScanViewWithSelection)
from .project import Project, Projector
from .compute import Compute
from .filter import Filter, compact_by_mask, compaction_indices
from .limit import Limit
from .generate import Generate
from .coalesce import Coalesce
from .sort import (ExtendedSort, Sort, SortKey, SortOrder,
                   SortWithTempDirPrefix, sort_permutation)
from .aggregate import (AggregateClusters,
                        AggregateClustersWithSpecifiedOutputBlockSize,
                        Aggregation, AggregationSpecification,
                        AggSpec, BestEffortGroupAggregate, GroupAggregate,
                        GroupAggregateOptions, HybridGroupAggregate,
                        ScalarAggregate)
from .hash_join import HashJoin, JoinType, KeyUniqueness
from .merge import MergeUnionAll
from .union import UnionAll
from .rowid_join import ForeignFilter, RowidMergeJoin
from .misc import (SharedOperation, Spy, SpyListener, TakeOwnership,
                   format_table)
from .host import group_concat, to_string  # (exprs.DateFormat is the
# device rendering path; ops.host.DateFormat stays the host fallback)
