// Empirical baseline: runs the BASELINE.json workloads through the REAL
// reference engine (google/supersonic, built from /root/reference with the
// shims in shims/).  Single-threaded, as the reference is by design
// (test/guide/primer.cc:33-34).  Prints per-op and pipeline times.
//
// Workloads mirror /root/repo/bench_ops.py and /root/repo/bench.py:
//   filter 8M            v > 0.5 over (fk,v,g)
//   groupby 8M->64       SUM(v) by g
//   groupby 8M->1M       SUM(v) by fk
//   sort 8M              by (g ASC, v DESC)
//   join 8M x 1M         INNER UNIQUE fk == pk, project v, w
//   pipeline 8M          filter -> join -> groupby(64) -> sort (bench.py)
#include <cstdio>
#include <ctime>
#include <memory>
#include <random>
#include <string>

#include "supersonic/supersonic.h"
#include "supersonic/cursor/core/scan_view.h"
#include "supersonic/cursor/infrastructure/table.h"
#include "supersonic/utils/exception/failureor.h"

using namespace supersonic;  // NOLINT

namespace {

double NowSec() {
  timespec ts;
  clock_gettime(CLOCK_MONOTONIC, &ts);
  return ts.tv_sec + ts.tv_nsec * 1e-9;
}

const int kFactRows = 8 * 1000 * 1000;
const int kDimRows = 1000 * 1000;
const int kGroups = 64;

// Drains a cursor to end-of-stream; returns total rows (and defeats
// dead-code elimination by consuming a value).
size_t Drain(Cursor* cursor) {
  size_t rows = 0;
  while (true) {
    ResultView result = cursor->Next(1024);
    if (result.is_eos()) break;
    if (!result.has_data()) {
      fprintf(stderr, "cursor failure\n");
      std::abort();
    }
    rows += result.view().row_count();
  }
  return rows;
}

struct Bench {
  BufferAllocator* alloc;
  std::unique_ptr<Table> fact;
  std::unique_ptr<Table> dim;

  void BuildData() {
    std::mt19937 rng(42);
    std::uniform_int_distribution<int32> fk_d(0, kDimRows - 1);
    std::uniform_int_distribution<int32> g_d(0, kGroups - 1);
    std::uniform_real_distribution<float> v_d(0.0f, 1.0f);

    TupleSchema fact_schema;
    fact_schema.add_attribute(Attribute("fk", INT32, NOT_NULLABLE));
    fact_schema.add_attribute(Attribute("v", FLOAT, NOT_NULLABLE));
    fact_schema.add_attribute(Attribute("g", INT32, NOT_NULLABLE));
    fact.reset(new Table(fact_schema, alloc));
    fact->ReserveRowCapacity(kFactRows);
    for (int i = 0; i < kFactRows; ++i) {
      rowid_t row = fact->AddRow();
      fact->Set<INT32>(0, row, fk_d(rng));
      fact->Set<FLOAT>(1, row, v_d(rng));
      fact->Set<INT32>(2, row, g_d(rng));
    }

    TupleSchema dim_schema;
    dim_schema.add_attribute(Attribute("pk", INT32, NOT_NULLABLE));
    dim_schema.add_attribute(Attribute("w", INT32, NOT_NULLABLE));
    dim.reset(new Table(dim_schema, alloc));
    dim->ReserveRowCapacity(kDimRows);
    for (int i = 0; i < kDimRows; ++i) {
      rowid_t row = dim->AddRow();
      dim->Set<INT32>(0, row, i);
      dim->Set<INT32>(1, row, g_d(rng));
    }
  }

  Operation* FilterOp() {
    return Filter(Greater(NamedAttribute("v"), ConstFloat(0.5f)),
                  ProjectAllAttributes(), ScanView(fact->view()));
  }

  Operation* GroupByOp(const char* key, int64 estimate) {
    AggregationSpecification* agg = new AggregationSpecification();
    agg->AddAggregation(SUM, "v", "sv");
    GroupAggregateOptions* options = new GroupAggregateOptions();
    options->set_estimated_result_row_count(estimate);
    return GroupAggregate(ProjectNamedAttribute(key), agg, options,
                          ScanView(fact->view()));
  }

  Operation* SortOp(Operation* child, const char* key1, const char* key2) {
    SortOrder* order = new SortOrder();
    order->OrderByNamedAttribute(key1, ASCENDING);
    if (key2 != NULL) order->OrderByNamedAttribute(key2, DESCENDING);
    return Sort(order, ProjectAllAttributes(), 1LL << 62, child);
  }

  Operation* JoinOp(Operation* lhs, Operation* rhs) {
    CompoundMultiSourceProjector* result = new CompoundMultiSourceProjector();
    result->add(0, ProjectNamedAttribute("v"));
    result->add(0, ProjectNamedAttribute("g"));
    result->add(1, ProjectNamedAttribute("w"));
    return new HashJoinOperation(
        INNER, ProjectNamedAttribute("fk"), ProjectNamedAttribute("pk"),
        result, UNIQUE, lhs, rhs);
  }

  // bench.py's headline pipeline: filter -> join -> group-by(64) -> sort.
  Operation* PipelineOp() {
    CompoundMultiSourceProjector* result = new CompoundMultiSourceProjector();
    result->add(0, ProjectNamedAttribute("v"));
    result->add(1, ProjectNamedAttribute("w"));
    Operation* join = new HashJoinOperation(
        INNER, ProjectNamedAttribute("fk"), ProjectNamedAttribute("pk"),
        result, UNIQUE,
        Filter(Greater(NamedAttribute("v"), ConstFloat(0.5f)),
               ProjectAllAttributes(), ScanView(fact->view())),
        ScanView(dim->view()));
    AggregationSpecification* agg = new AggregationSpecification();
    agg->AddAggregation(SUM, "v", "sv");
    agg->AddAggregation(COUNT, "v", "c");
    GroupAggregateOptions* options = new GroupAggregateOptions();
    options->set_estimated_result_row_count(kGroups);
    Operation* grouped = GroupAggregate(
        ProjectNamedAttribute("w"), agg, options, join);
    SortOrder* order = new SortOrder();
    order->OrderByNamedAttribute("sv", DESCENDING);
    return Sort(order, ProjectAllAttributes(), 1LL << 62, grouped);
  }

  void Run(const char* name, Operation* op, double input_rows) {
    std::unique_ptr<Operation> owned(op);
    owned->SetBufferAllocator(alloc, false);
    double best = 1e30;
    size_t rows = 0;
    for (int rep = 0; rep < 3; ++rep) {
      double t0 = NowSec();
      std::unique_ptr<Cursor> cursor(SucceedOrDie(owned->CreateCursor()));
      rows = Drain(cursor.get());
      double dt = NowSec() - t0;
      if (dt < best) best = dt;
    }
    printf("%-24s %9.1f ms   %10.1f M rows/s   (out rows=%zu)\n", name,
           best * 1e3, input_rows / best / 1e6, rows);
    fflush(stdout);
  }
};

}  // namespace

int main(int argc, char** argv) {
  Bench bench;
  bench.alloc = HeapBufferAllocator::Get();
  double t0 = NowSec();
  bench.BuildData();
  fprintf(stderr, "data build: %.1f s\n", NowSec() - t0);

  bench.Run("filter 8M", bench.FilterOp(), kFactRows);
  bench.Run("groupby 8M->64", bench.GroupByOp("g", kGroups), kFactRows);
  bench.Run("groupby 8M->1M keys", bench.GroupByOp("fk", kDimRows),
            kFactRows);
  bench.Run("sort 8M by (g,v)",
            bench.SortOp(ScanView(bench.fact->view()), "g", "v"), kFactRows);
  bench.Run("join 8M x 1M",
            bench.JoinOp(ScanView(bench.fact->view()),
                         ScanView(bench.dim->view())),
            kFactRows);
  bench.Run("pipeline 8M", bench.PipelineOp(), kFactRows);
  return 0;
}
