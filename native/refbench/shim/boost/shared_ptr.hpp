#pragma once
// boost::shared_ptr shim: the reference only uses it as a smart pointer type
// (orcvio.h:93, image_processor.h:69). std::shared_ptr is a drop-in here.
#include <memory>
namespace boost {
using std::shared_ptr;
using std::static_pointer_cast;
using std::dynamic_pointer_cast;
using std::make_shared;
}  // namespace boost
