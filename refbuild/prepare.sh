#!/bin/bash
# Generates the out-of-tree build inputs for the reference engine
# (/root/reference, read-only):
#   gen/      protoc output for the reference's .proto files + config.h stub
#   patched/  a one-header shadow fixing an argument-evaluation-order bug
#             that crashes the 2014 code under GCC 12 (see comment below)
# Run once before `make`.  Nothing under gen/ or patched/ is committed —
# both are derived from the reference at build time.
set -euo pipefail
cd "$(dirname "$0")"
REF=${REF:-/root/reference}

# --- protoc ---------------------------------------------------------------
rm -rf gen patched
mkdir -p gen
cat > gen/config.h <<'EOF'
// autoconf config stub (no RE2 in this image)
#ifndef SHIM_AUTOCONF_CONFIG_H_
#define SHIM_AUTOCONF_CONFIG_H_
#endif
EOF
# autoconf AX_PREFIX_CONFIG_H output (configure.ac:23); a stub is enough —
# the only macro consulted with a default is SUPERSONIC_FORCE_FAILURE_CHECK
# (failureor.h:44-48), which defaults itself when undefined.
mkdir -p gen/supersonic
cat > gen/supersonic/supersonic-config.h <<'EOF'
// autoconf prefix-config stub (configure.ac:23)
#ifndef SHIM_SUPERSONIC_CONFIG_H_
#define SHIM_SUPERSONIC_CONFIG_H_
#endif
EOF
protos=(
  supersonic/proto/supersonic.proto
  supersonic/proto/specification.proto
  supersonic/benchmark/proto/benchmark.proto
  supersonic/expression/proto/operators.proto
  supersonic/cursor/proto/cursors.proto
  supersonic/utils/proto/expressions.proto
  supersonic/utils/proto/types.proto
  supersonic/utils/exception/stack_trace.proto
)
for p in "${protos[@]}"; do
  protoc --proto_path="$REF" --cpp_out=gen "$REF/$p"
done

# --- patched header --------------------------------------------------------
# abstract_bound_expressions.h:175-183 passes
#   CreateSchema(..., left.get(), right.get(), ...)
# and left.release()/right.release() as arguments of the SAME new-expression.
# Argument evaluation order is unspecified; GCC 12 evaluates the release()s
# first, so CreateSchema dereferences NULL and every binary-expression Bind
# segfaults.  The 2014 toolchain happened to evaluate the other way round.
# The reference tree is read-only, so shadow the header (-Ipatched wins) and
# hoist the CreateSchema call into a local.
mkdir -p patched/supersonic/expression/templated
python3 - "$REF" <<'EOF'
import sys
ref = sys.argv[1]
path = "supersonic/expression/templated/abstract_bound_expressions.h"
src = open(f"{ref}/{path}").read()
old = """  AbstractBoundBinaryExpression<op, output_type,
                                left_type, right_type>* result =
      new AbstractBoundBinaryExpression<op, output_type,
                                        left_type, right_type> (
          CreateSchema(expression_name, output_type, left.get(), right.get(),
                       BinaryExpressionTraits<op>::can_return_null
                           ? NULLABLE
                           : NOT_NULLABLE),
          allocator, left.release(), right.release());"""
new = """  // PATCHED by prepare.sh (see comment there): hoist CreateSchema out of
  // the new-expression so it runs before left.release()/right.release().
  const TupleSchema result_schema =
      CreateSchema(expression_name, output_type, left.get(), right.get(),
                   BinaryExpressionTraits<op>::can_return_null
                       ? NULLABLE
                       : NOT_NULLABLE);
  AbstractBoundBinaryExpression<op, output_type,
                                left_type, right_type>* result =
      new AbstractBoundBinaryExpression<op, output_type,
                                        left_type, right_type> (
          result_schema,
          allocator, left.release(), right.release());"""
assert old in src, "reference header changed; re-audit the patch"
open(f"patched/{path}", "w").write(src.replace(old, new))
EOF
echo "prepare.sh: gen/ and patched/ ready"
