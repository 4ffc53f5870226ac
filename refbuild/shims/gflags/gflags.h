// Minimal gflags shim: DEFINE_*/DECLARE_* macros + ParseCommandLineFlags.
// Flags keep their default values (no command-line parsing needed for the
// baseline drivers).
#ifndef SHIM_GFLAGS_GFLAGS_H_
#define SHIM_GFLAGS_GFLAGS_H_

#include <cstdint>
#include <string>

#define DEFINE_VARIABLE(type, name, value, meaning) \
  namespace fLShim { type FLAGS_##name = value; }    \
  using fLShim::FLAGS_##name
#define DECLARE_VARIABLE(type, name) \
  namespace fLShim { extern type FLAGS_##name; } \
  using fLShim::FLAGS_##name

#define DEFINE_bool(name, value, meaning) \
  DEFINE_VARIABLE(bool, name, value, meaning)
#define DEFINE_int32(name, value, meaning) \
  DEFINE_VARIABLE(int32_t, name, value, meaning)
#define DEFINE_int64(name, value, meaning) \
  DEFINE_VARIABLE(int64_t, name, value, meaning)
#define DEFINE_uint64(name, value, meaning) \
  DEFINE_VARIABLE(uint64_t, name, value, meaning)
#define DEFINE_double(name, value, meaning) \
  DEFINE_VARIABLE(double, name, value, meaning)
#define DEFINE_string(name, value, meaning) \
  DEFINE_VARIABLE(std::string, name, value, meaning)

#define DECLARE_bool(name) DECLARE_VARIABLE(bool, name)
#define DECLARE_int32(name) DECLARE_VARIABLE(int32_t, name)
#define DECLARE_int64(name) DECLARE_VARIABLE(int64_t, name)
#define DECLARE_uint64(name) DECLARE_VARIABLE(uint64_t, name)
#define DECLARE_double(name) DECLARE_VARIABLE(double, name)
#define DECLARE_string(name) DECLARE_VARIABLE(std::string, name)

namespace google {
inline bool ParseCommandLineFlags(int*, char***, bool) { return true; }
inline void ShutDownCommandLineFlags() {}
}  // namespace google

#endif  // SHIM_GFLAGS_GFLAGS_H_
