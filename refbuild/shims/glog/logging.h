// Minimal glog shim for building the reference engine in this image
// (no network; real glog is unavailable).  Covers the subset supersonic
// uses: LOG/DLOG/VLOG/LOG_ASSERT, CHECK*/DCHECK*, CHECK_NOTNULL,
// google::InitGoogleLogging.
#ifndef SHIM_GLOG_LOGGING_H_
#define SHIM_GLOG_LOGGING_H_

#include <cstdlib>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

namespace shim_logging {

enum LogSeverity { INFO = 0, WARNING = 1, ERROR = 2, FATAL = 3, DFATAL = 3 };

class LogMessage {
 public:
  LogMessage(const char* file, int line, int severity)
      : severity_(severity) {
    stream_ << "[" << "IWEF"[severity] << " " << file << ":" << line << "] ";
  }
  ~LogMessage() {
    stream_ << "\n";
    std::cerr << stream_.str();
    if (severity_ >= 3) std::abort();
  }
  std::ostream& stream() { return stream_; }

 private:
  std::ostringstream stream_;
  int severity_;
};

// Swallows the streamed message entirely (used for disabled DLOG/VLOG).
class NullStream {
 public:
  template <typename T>
  NullStream& operator<<(const T&) { return *this; }
  NullStream& operator<<(std::ostream& (*)(std::ostream&)) { return *this; }
};

struct Voidify {
  void operator&(std::ostream&) {}
  void operator&(NullStream&) {}
};

template <typename T>
T* CheckNotNull(const char* file, int line, const char* msg, T* t) {
  if (t == nullptr) {
    LogMessage(file, line, FATAL).stream() << "Check failed: " << msg;
  }
  return t;
}

}  // namespace shim_logging

#define SHIM_LOG_INFO \
  ::shim_logging::LogMessage(__FILE__, __LINE__, ::shim_logging::INFO)
#define SHIM_LOG_WARNING \
  ::shim_logging::LogMessage(__FILE__, __LINE__, ::shim_logging::WARNING)
#define SHIM_LOG_ERROR \
  ::shim_logging::LogMessage(__FILE__, __LINE__, ::shim_logging::ERROR)
#define SHIM_LOG_FATAL \
  ::shim_logging::LogMessage(__FILE__, __LINE__, ::shim_logging::FATAL)
#define SHIM_LOG_DFATAL SHIM_LOG_FATAL

#define LOG(severity) SHIM_LOG_##severity.stream()
#define DLOG(severity) \
  true ? (void)0 : ::shim_logging::Voidify() & SHIM_LOG_##severity.stream()
#define VLOG(level) \
  true ? (void)0 : ::shim_logging::Voidify() & SHIM_LOG_INFO.stream()
#define DVLOG(level) VLOG(level)
#define VLOG_IS_ON(level) false
// glog's LOG_STRING(severity, vector) appends to the vector when non-NULL;
// the reference only uses it for temp-dir warnings — log and move on.
#define LOG_STRING(severity, outvec) SHIM_LOG_##severity.stream()
#define LOG_IF(severity, cond) \
  !(cond) ? (void)0 : ::shim_logging::Voidify() & SHIM_LOG_##severity.stream()
#define LOG_ASSERT(cond) \
  (cond) ? (void)0 : ::shim_logging::Voidify() & SHIM_LOG_FATAL.stream()

#define CHECK(cond)                   \
  (cond) ? (void)0                    \
         : ::shim_logging::Voidify() &\
           SHIM_LOG_FATAL.stream() << "Check failed: " #cond " "

#define SHIM_CHECK_OP(op, a, b)        \
  ((a)op(b)) ? (void)0                 \
             : ::shim_logging::Voidify() & \
               SHIM_LOG_FATAL.stream() << "Check failed: " #a " " #op " " #b " "
#define CHECK_EQ(a, b) SHIM_CHECK_OP(==, a, b)
#define CHECK_NE(a, b) SHIM_CHECK_OP(!=, a, b)
#define CHECK_LT(a, b) SHIM_CHECK_OP(<, a, b)
#define CHECK_LE(a, b) SHIM_CHECK_OP(<=, a, b)
#define CHECK_GT(a, b) SHIM_CHECK_OP(>, a, b)
#define CHECK_GE(a, b) SHIM_CHECK_OP(>=, a, b)
#define CHECK_NOTNULL(val) \
  ::shim_logging::CheckNotNull(__FILE__, __LINE__, "'" #val "' != NULL", (val))

#ifndef NDEBUG
#define DCHECK(cond) CHECK(cond)
#define DCHECK_EQ(a, b) CHECK_EQ(a, b)
#define DCHECK_NE(a, b) CHECK_NE(a, b)
#define DCHECK_LT(a, b) CHECK_LT(a, b)
#define DCHECK_LE(a, b) CHECK_LE(a, b)
#define DCHECK_GT(a, b) CHECK_GT(a, b)
#define DCHECK_GE(a, b) CHECK_GE(a, b)
#else
#define SHIM_DCHECK_SINK(cond) \
  true ? (void)0 : ::shim_logging::Voidify() & SHIM_LOG_FATAL.stream() << !(cond)
#define DCHECK(cond) SHIM_DCHECK_SINK(cond)
#define DCHECK_EQ(a, b) SHIM_DCHECK_SINK((a) == (b))
#define DCHECK_NE(a, b) SHIM_DCHECK_SINK((a) != (b))
#define DCHECK_LT(a, b) SHIM_DCHECK_SINK((a) < (b))
#define DCHECK_LE(a, b) SHIM_DCHECK_SINK((a) <= (b))
#define DCHECK_GT(a, b) SHIM_DCHECK_SINK((a) > (b))
#define DCHECK_GE(a, b) SHIM_DCHECK_SINK((a) >= (b))
#endif

namespace google {
inline void InitGoogleLogging(const char*) {}
inline void InstallFailureSignalHandler() {}
inline void GetExistingTempDirectories(std::vector<std::string>* list) {
  list->push_back("/tmp");
}
}  // namespace google

// Severity names leak unqualified in a few reference TUs (LogSeverity
// arguments); mirror glog's global constants.
const int INFO = ::shim_logging::INFO;
const int WARNING = ::shim_logging::WARNING;
const int ERROR = ::shim_logging::ERROR;
const int FATAL = ::shim_logging::FATAL;

#endif  // SHIM_GLOG_LOGGING_H_
