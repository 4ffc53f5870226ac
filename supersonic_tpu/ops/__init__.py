from .base import (BindContext, BoundOperation, Operation, RunContext,
                   bind_plan, compile_plan, execute)
from .scan import ScanTable, ScanTableWithSelection
from .project import Project, Projector
from .compute import Compute
from .filter import Filter, compact_by_mask, compaction_indices
from .limit import Limit
from .generate import Generate
from .coalesce import Coalesce
