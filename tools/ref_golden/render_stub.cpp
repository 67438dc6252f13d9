// Link stubs for the Vulkan batch renderer so the reference CPU executor
// (src/mw/cpu_exec.cpp) links without any graphics stack.  The golden
// harness always runs with CameraMode::None, so makeRenderer()
// (cpu_exec.cpp:95-113) returns none() and none of these are ever called.
#include "render/batch_renderer.hpp"

#include <cstdio>
#include <cstdlib>

namespace madrona {
namespace render {

struct BatchRenderer::Impl {};

static void unreachable()
{
    fprintf(stderr, "render_stub: BatchRenderer used with rendering off\n");
    abort();
}

BatchRenderer::BatchRenderer(const Config &) : impl_(nullptr)
{
    unreachable();
}

BatchRenderer::BatchRenderer(BatchRenderer &&o) = default;
BatchRenderer::~BatchRenderer() = default;

CountT BatchRenderer::loadObjects(Span<const imp::SourceObject>)
{
    unreachable();
    return 0;
}

RendererInterface BatchRenderer::getInterface() const
{
    unreachable();
    return {};
}

uint8_t *BatchRenderer::rgbPtr() const
{
    unreachable();
    return nullptr;
}

float *BatchRenderer::depthPtr() const
{
    unreachable();
    return nullptr;
}

void BatchRenderer::render()
{
    unreachable();
}

}
}
