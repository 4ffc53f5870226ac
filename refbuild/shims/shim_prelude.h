// Force-included (-include) into every reference TU: fills the gaps a
// 2014-era google3 codebase expects from its original toolchain.
#ifndef SHIM_PRELUDE_H_
#define SHIM_PRELUDE_H_

#include <time.h>
#include <unistd.h>

#include <functional>
#include <vector>

// operators.h:346 instantiates std::hash on vector<bool>::reference when
// the In-expression hashes bool needles; give it the obvious meaning.
namespace std {
template <>
struct hash<std::_Bit_reference> {
  size_t operator()(const std::_Bit_reference& b) const {
    return static_cast<bool>(b) ? 1 : 0;
  }
};
}  // namespace std

#endif  // SHIM_PRELUDE_H_
