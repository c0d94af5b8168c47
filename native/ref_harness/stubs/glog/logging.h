// Minimal glog-compatible stub for the headless reference-measurement
// harness (see native/ref_harness/README.md). Provides exactly the macro
// surface the reference core uses: LOG(INFO/WARNING/ERROR/FATAL), DLOG,
// CHECK, CHECK_{GE,GT,LE,NE,EQ,LT}.  INFO/WARNING/DLOG are swallowed so the
// harness stdout stays parseable; ERROR goes to stderr; FATAL and failed
// CHECKs abort with a message, matching glog semantics.
#ifndef REF_HARNESS_GLOG_LOGGING_H
#define REF_HARNESS_GLOG_LOGGING_H

#include <cstdlib>
#include <iostream>
#include <sstream>
#include <string>

namespace refglog {

class NullStream {
 public:
  template <typename T>
  NullStream& operator<<(const T&) { return *this; }
  NullStream& operator<<(std::ostream& (*)(std::ostream&)) { return *this; }
};

inline NullStream& null_stream() {
  static NullStream s;
  return s;
}

// Streams into a buffer; aborts in the destructor (end of full expression).
class FatalMessage {
 public:
  FatalMessage(const char* file, int line, const char* what) {
    ss_ << file << ":" << line << " " << what << " ";
  }
  [[noreturn]] ~FatalMessage() {
    std::cerr << "FATAL " << ss_.str() << std::endl;
    std::abort();
  }
  std::ostringstream& stream() { return ss_; }

 private:
  std::ostringstream ss_;
};

inline void InitGoogleLogging(const char*) {}

}  // namespace refglog

namespace google {
using refglog::InitGoogleLogging;
}

#define LOG(severity) REF_LOG_##severity
#define REF_LOG_INFO refglog::null_stream()
#define REF_LOG_WARNING refglog::null_stream()
#define REF_LOG_ERROR std::cerr
#define REF_LOG_FATAL refglog::FatalMessage(__FILE__, __LINE__, "LOG(FATAL)").stream()

#define DLOG(severity) refglog::null_stream()

#define CHECK(cond) \
  if (cond) {       \
  } else            \
    refglog::FatalMessage(__FILE__, __LINE__, "CHECK failed: " #cond).stream()

#define CHECK_OP(name, op, a, b) CHECK((a)op(b))
#define CHECK_EQ(a, b) CHECK_OP(EQ, ==, a, b)
#define CHECK_NE(a, b) CHECK_OP(NE, !=, a, b)
#define CHECK_GT(a, b) CHECK_OP(GT, >, a, b)
#define CHECK_GE(a, b) CHECK_OP(GE, >=, a, b)
#define CHECK_LT(a, b) CHECK_OP(LT, <, a, b)
#define CHECK_LE(a, b) CHECK_OP(LE, <=, a, b)

#endif  // REF_HARNESS_GLOG_LOGGING_H
