// Minimal boost::timer::cpu_timer shim over clock_gettime — the reference
// only uses it through supersonic/utils/timer.h (wall/user/system times).
#ifndef SHIM_BOOST_TIMER_TIMER_HPP_
#define SHIM_BOOST_TIMER_TIMER_HPP_

#include <ctime>
#include <cstdint>

namespace boost {
namespace timer {

typedef int64_t nanosecond_type;

struct cpu_times {
  nanosecond_type wall;
  nanosecond_type user;
  nanosecond_type system;
  void clear() { wall = user = system = 0; }
};

class cpu_timer {
 public:
  cpu_timer() { start(); }

  void start() {
    stopped_ = false;
    accumulated_.clear();
    started_ = now();
  }

  void resume() {
    if (stopped_) {
      stopped_ = false;
      started_ = now();
    }
  }

  void stop() {
    if (!stopped_) {
      accumulate();
      stopped_ = true;
    }
  }

  bool is_stopped() const { return stopped_; }

  cpu_times elapsed() const {
    cpu_times t = accumulated_;
    if (!stopped_) {
      cpu_times cur = now();
      t.wall += cur.wall - started_.wall;
      t.user += cur.user - started_.user;
      t.system += cur.system - started_.system;
    }
    return t;
  }

 private:
  static cpu_times now() {
    cpu_times t;
    timespec w, c;
    clock_gettime(CLOCK_MONOTONIC, &w);
    clock_gettime(CLOCK_PROCESS_CPUTIME_ID, &c);
    t.wall = w.tv_sec * 1000000000LL + w.tv_nsec;
    t.user = c.tv_sec * 1000000000LL + c.tv_nsec;
    t.system = 0;
    return t;
  }

  void accumulate() {
    cpu_times cur = now();
    accumulated_.wall += cur.wall - started_.wall;
    accumulated_.user += cur.user - started_.user;
    accumulated_.system += cur.system - started_.system;
  }

  cpu_times accumulated_;
  cpu_times started_;
  bool stopped_;
};

}  // namespace timer
}  // namespace boost

#endif  // SHIM_BOOST_TIMER_TIMER_HPP_
