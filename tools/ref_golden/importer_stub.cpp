// Link stub: PhysicsLoader::loadHullFromDisk references the .obj importer,
// whose external deps (fast_float, meshoptimizer) are empty submodules in
// the snapshot.  The golden harness builds hulls programmatically and
// never calls it.
#include <madrona/importer.hpp>
#include <madrona/crash.hpp>

namespace madrona::imp {

Optional<ImportedObject> ImportedObject::importObject(const char *)
{
    FATAL("importer_stub: .obj import unavailable in golden harness");
}

}
