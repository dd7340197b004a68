#include "gltf.h"

namespace wrt {

// GLB loader lands in a later milestone this round; returning false keeps the
// preset/OBJ paths fully functional in the meantime.
bool load_gltf(std::vector<Geometry>&, std::vector<SceneInstance>&,
               std::vector<Node>&, std::vector<Skin>&, std::vector<Animation>&,
               std::vector<std::vector<uint8_t>>&, const uint8_t*, size_t) {
  return false;
}

}  // namespace wrt
