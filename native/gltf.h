// glTF 2.0 / GLB / VRM loader.
// Capability parity: reference rust-shader-tools/src/loader.rs (textures from
// buffer views, node hierarchy, skins w/ inverse bind matrices, one Geometry
// per mesh primitive, PBR material -> mat_type mapping, animations).
#pragma once
#include <cstdint>
#include <vector>

#include "geometry.h"
#include "scene_types.h"

namespace wrt {

// Parses a .glb container (VRM files are GLB). Appends into the provided
// scene vectors. Returns false on parse failure.
bool load_gltf(std::vector<Geometry>& geometries,
               std::vector<SceneInstance>& instances, std::vector<Node>& nodes,
               std::vector<Skin>& skins, std::vector<Animation>& animations,
               std::vector<std::vector<uint8_t>>& textures,
               const uint8_t* data, size_t len);

}  // namespace wrt
