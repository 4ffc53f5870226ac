// Shim over the real protobuf stubs/common.h: modern protobuf moved the
// google::protobuf::Mutex family (imported by
// supersonic/base/memory/memory.h:42-45) into stubs/mutex.h, which
// common.h no longer includes — pull it back in.
#ifndef SHIM_PROTOBUF_STUBS_COMMON_H_
#define SHIM_PROTOBUF_STUBS_COMMON_H_

#include_next <google/protobuf/stubs/common.h>
#include <google/protobuf/stubs/mutex.h>

#endif  // SHIM_PROTOBUF_STUBS_COMMON_H_
