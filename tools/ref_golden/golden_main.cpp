// Golden-trajectory generator: runs the REFERENCE engine (ECS core,
// taskgraph executor, BVH broadphase, SAT narrowphase, XPBD solver —
// compiled verbatim from /root/reference/src) on deterministic rigid-body
// scenarios and dumps per-tick body states to a binary file consumed by
// tests/test_reference_golden.py.
//
// The in-tree example CPU mains do not compile in this snapshot (they
// target a pre-migration API: SimEntry is undefined, <madrona/render.hpp>
// does not exist, RigidBodyPhysicsSystem::init has a different signature),
// so this harness plays the role of examples/simple_taskgraph/mw_cpu.cpp
// against the CURRENT in-tree engine API.  Only hull-hull and hull-plane
// narrowphase are implemented in the snapshot
// (src/physics/narrowphase.cpp:1197-1314 — the other cases are
// assert(false)), so all scenarios are cube hulls + a static ground plane.
//
// NOTE the harness runs the engine in SINGLE-WORLD mode (no
// MADRONA_MW_MODE), one StateManager + TaskGraph per world, stepped
// serially.  This is forced by a snapshot bug: phys::Cols
// (include/madrona/physics.hpp:449-462) hardcodes user components
// starting at column 1 (the GPU device layout,
// src/mw/device/include/madrona/state.hpp:282), but CPU MW mode inserts a
// WorldID column making user_component_offset_ = 2
// (include/madrona/state.hpp:382-387), so every solver getDirect() is
// shifted one column in MW mode and corrupts memory (verified with ASan:
// findOverlappingEntry writes an 8-byte Loc into the 4-byte WorldID
// column).  Single-world mode has offset 1 — the layout the physics
// module was written for.
//
// Output format (little-endian):
//   magic  "GLD1"            (4 bytes)
//   int32  num_ticks_plus_1, num_worlds, num_bodies, substeps
//   float  dt
//   float  data[num_ticks_plus_1][num_worlds][num_bodies][13]
//            (pos xyz, rot wxyz, vel xyz, omega xyz); tick 0 = init state
//
// Determinism: initial conditions come from splitmix64 hashes (exactly
// reproducible in numpy), and the executor runs with numWorkers=1.

#include <madrona/state.hpp>
#include <madrona/physics.hpp>
#include <madrona/physics_assets.hpp>
#include <madrona/custom_context.hpp>
#include <madrona/taskgraph.hpp>

#include <core/worker_init.hpp>

#include <cinttypes>
#include <cstdio>
#include <cstring>
#include <memory>
#include <string>
#include <vector>

using namespace madrona;
using namespace madrona::base;
using namespace madrona::math;
using namespace madrona::phys;

namespace golden {

struct DumpSlot {
    int32_t world;
    int32_t slot;
};

// Column order 1..12 must match phys::Cols (include/madrona/physics.hpp:449-462):
// the solver reads components by fixed column index via getDirect.
struct Body : Archetype<
    Position,                  // Cols::Position = 1
    Rotation,                  // 2
    Scale,                     // 3
    Velocity,                  // 4
    ObjectID,                  // 5
    ResponseType,              // 6
    solver::SubstepPrevState,  // 7
    solver::PreSolvePositional,// 8
    solver::PreSolveVelocity,  // 9
    ExternalForce,             // 10
    ExternalTorque,            // 11
    broadphase::LeafID,        // 12
    DumpSlot                   // extra user column (after the fixed block)
> {};

struct GoldenConfig {
    int scenario;       // 0=cubes_fall .. 4=cube_hinge, 5=cube_bounce
    int numBodies;      // dynamic cubes per world
    int numSubsteps;
    float dt;
};

struct WorldInit {
    uint32_t worldIdx;
};

// ---------------------------------------------------------------------------
// Deterministic init values (splitmix64 → f32), replicated in numpy.
// ---------------------------------------------------------------------------

static inline uint64_t splitmix64(uint64_t x)
{
    x += 0x9E3779B97F4A7C15ull;
    x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9ull;
    x = (x ^ (x >> 27)) * 0x94D049BB133111EBull;
    return x ^ (x >> 31);
}

static inline float hash01(uint32_t world, uint32_t slot, uint32_t channel)
{
    uint64_t h = splitmix64(((uint64_t)world << 32) |
                            ((uint64_t)slot << 8) | channel);
    return (float)(h >> 40) / 16777216.f;  // 24-bit mantissa fraction
}

// ---------------------------------------------------------------------------
// Dump plumbing
// ---------------------------------------------------------------------------

static float *g_dump = nullptr;
static int g_tick = 0;      // written by main loop between runs
static int g_W = 0, g_K = 0;

static inline void writeRecord(int world, int slot, const Vector3 &p,
                               const Quat &q, const Vector3 &v,
                               const Vector3 &w)
{
    float *dst = g_dump +
        (((size_t)g_tick * g_W + world) * g_K + slot) * 13;
    dst[0] = p.x; dst[1] = p.y; dst[2] = p.z;
    dst[3] = q.w; dst[4] = q.x; dst[5] = q.y; dst[6] = q.z;
    dst[7] = v.x; dst[8] = v.y; dst[9] = v.z;
    dst[10] = w.x; dst[11] = w.y; dst[12] = w.z;
}

inline void dumpSystem(Context &, DumpSlot &slot, Position &pos,
                       Rotation &rot, Velocity &vel)
{
    if (slot.slot < 0) return;  // static plane
    writeRecord(slot.world, slot.slot, pos, rot, vel.linear, vel.angular);
}

// ---------------------------------------------------------------------------
// World
// ---------------------------------------------------------------------------

class Engine;

struct GoldenSim : WorldBase {
    static ObjectManager *objMgr;

    static void registerTypes(ECSRegistry &registry, const GoldenConfig &);
    static void setupTasks(TaskGraph::Builder &builder, const GoldenConfig &);

    GoldenSim(Engine &ctx, const GoldenConfig &cfg, const WorldInit &init);
};

ObjectManager *GoldenSim::objMgr = nullptr;

class Engine : public ::madrona::CustomContext<Engine, GoldenSim> {
    using CustomContext::CustomContext;
};

void GoldenSim::registerTypes(ECSRegistry &registry, const GoldenConfig &)
{
    base::registerTypes(registry);
    RigidBodyPhysicsSystem::registerTypes(registry);
    registry.registerComponent<DumpSlot>();
    registry.registerArchetype<Body>();
}

void GoldenSim::setupTasks(TaskGraph::Builder &builder,
                           const GoldenConfig &cfg)
{
    auto broadphase = RigidBodyPhysicsSystem::setupBroadphaseTasks(
        builder, {});
    auto substeps = RigidBodyPhysicsSystem::setupSubstepTasks(
        builder, {broadphase}, cfg.numSubsteps);
    auto dump = builder.addToGraph<ParallelForNode<Context, dumpSystem,
        DumpSlot, Position, Rotation, Velocity>>({substeps});
    RigidBodyPhysicsSystem::setupCleanupTasks(builder, {dump});
}

GoldenSim::GoldenSim(Engine &ctx, const GoldenConfig &cfg,
                     const WorldInit &init)
    : WorldBase(ctx)
{
    uint32_t w = init.worldIdx;

    RigidBodyPhysicsSystem::init(ctx, objMgr, cfg.dt, cfg.numSubsteps,
                                 Vector3 { 0, 0, -9.8f },
                                 cfg.numBodies + 1,
                                 cfg.numBodies * 20,
                                 4 /* max joints */);

    auto makeBody = [&](const Vector3 &pos, const Quat &rot,
                        const Vector3 &vel, int32_t obj_idx,
                        ResponseType resp, int32_t slot) {
        Entity e = ctx.makeEntityNow<Body>();
        ctx.getUnsafe<Position>(e) = Position { pos };
        ctx.getUnsafe<Rotation>(e) = Rotation { rot };
        ctx.getUnsafe<Scale>(e) = Scale { Diag3x3 { 1, 1, 1 } };
        ctx.getUnsafe<Velocity>(e) = Velocity { vel, Vector3::zero() };
        ctx.getUnsafe<ObjectID>(e) = ObjectID { obj_idx };
        ctx.getUnsafe<ResponseType>(e) = resp;
        ctx.getUnsafe<ExternalForce>(e) = ExternalForce { Vector3::zero() };
        ctx.getUnsafe<ExternalTorque>(e) = ExternalTorque { Vector3::zero() };
        ctx.getUnsafe<broadphase::LeafID>(e) =
            RigidBodyPhysicsSystem::registerEntity(ctx, e, ObjectID { obj_idx });
        ctx.getUnsafe<DumpSlot>(e) = DumpSlot { (int32_t)w, slot };
        return e;
    };

    // ground plane (static)
    makeBody(Vector3 { 0, 0, 0 }, Quat { 1, 0, 0, 0 }, Vector3::zero(),
             0, ResponseType::Static, -1);

    if (cfg.scenario == 4) {
        // cube_hinge: pendulum — static anchor cube + dynamic cube hinged
        // at its lower edge (reference JointConstraint::setupHinge,
        // physics.inl:171-190; solve at physics.cpp:617-630), swings
        // under gravity about the shared y axis
        Entity a = makeBody(Vector3 { 0, 0, 6.f }, Quat { 1, 0, 0, 0 },
                            Vector3::zero(), 1, ResponseType::Static, 0);
        writeRecord(w, 0, ctx.getUnsafe<Position>(a),
                    ctx.getUnsafe<Rotation>(a), Vector3::zero(),
                    Vector3::zero());
        // dynamic cube starts swung out to the side, hinge at the shared
        // point (0.6 below A's center = 0.6 above B's center)
        float ang = 0.15f + 0.1f * hash01(w, 1, 0);  // initial swing angle
        float s_ = sinf(ang), c_ = cosf(ang);
        // B's center = hinge point + 0.6 * (swung-down direction)
        Vector3 hinge_w { 0, 0, 6.f - 0.6f };
        Vector3 down { s_, 0, -c_ };
        Quat rotb = Quat::angleAxis(ang, Vector3 { 0, 1, 0 });
        Entity b = makeBody(hinge_w + 0.6f * down, rotb, Vector3::zero(),
                            1, ResponseType::Dynamic, 1);
        writeRecord(w, 1, ctx.getUnsafe<Position>(b),
                    ctx.getUnsafe<Rotation>(b), Vector3::zero(),
                    Vector3::zero());
        Entity j = ctx.makeEntityNow<ConstraintData>();
        ctx.getUnsafe<JointConstraint>(j) = JointConstraint::setupHinge(
            a, b, Vector3 { 0, 1, 0 }, Vector3 { 0, 1, 0 },
            Vector3 { 1, 0, 0 }, Vector3 { 1, 0, 0 },
            Vector3 { 0, 0, -0.6f }, Vector3 { 0, 0, 0.6f });
        ctx.getSingleton<broadphase::BVH>().rebuildOnUpdate();
        return;
    }

    if (cfg.scenario == 3) {
        // cube_chain: two cubes linked by a Fixed joint (reference
        // JointConstraint::setupFixed, physics.inl:151-169; solve at
        // physics.cpp:560-648), lower cube offset in x so the pair
        // swings as it falls onto the plane
        Entity a = makeBody(Vector3 { 0, 0, 5.f }, Quat { 1, 0, 0, 0 },
                            Vector3::zero(), 1, ResponseType::Dynamic, 0);
        writeRecord(w, 0, ctx.getUnsafe<Position>(a),
                    ctx.getUnsafe<Rotation>(a), Vector3::zero(),
                    Vector3::zero());
        float xb = 0.3f + 0.2f * hash01(w, 1, 0);
        Entity b = makeBody(Vector3 { xb, 0, 3.8f }, Quat { 1, 0, 0, 0 },
                            Vector3::zero(), 1, ResponseType::Dynamic, 1);
        writeRecord(w, 1, ctx.getUnsafe<Position>(b),
                    ctx.getUnsafe<Rotation>(b), Vector3 { 0, 0, 0 },
                    Vector3::zero());
        Entity j = ctx.makeEntityNow<ConstraintData>();
        ctx.getUnsafe<JointConstraint>(j) = JointConstraint::setupFixed(
            a, b, Quat { 1, 0, 0, 0 }, Quat { 1, 0, 0, 0 },
            Vector3 { 0, 0, -0.6f }, Vector3 { 0, 0, 0.6f }, 0.f);
        ctx.getSingleton<broadphase::BVH>().rebuildOnUpdate();
        return;
    }

    for (int i = 0; i < cfg.numBodies; i++) {
        Vector3 pos;
        Quat rot = Quat { 1, 0, 0, 0 };
        Vector3 vel = Vector3::zero();

        switch (cfg.scenario) {
        case 0: {  // cubes_fall: spread cubes dropped from height
            pos = Vector3 {
                -3.f + 6.f * hash01(w, i, 0),
                -3.f + 6.f * hash01(w, i, 1),
                1.f + 2.f * i + 1.5f * hash01(w, i, 2),
            };
        } break;
        case 1: {  // cube_pair: head-on collision on the plane
            float side = (i % 2 == 0) ? -1.f : 1.f;
            pos = Vector3 { side * (2.f + hash01(w, i, 0)), 0.f, 0.5f };
            vel = Vector3 { -side * 2.f, 0.f, 0.f };
        } break;
        case 5: {  // cube_bounce: clean axis-aligned drop (restitution)
            pos = Vector3 { 0.f, 0.f, 3.f + 2.f * hash01(w, i, 0) };
        } break;
        case 6: {  // cube_rock: cube tilted about its y edge, dropped just
            // above the plane — lands on the edge and rocks to rest.
            // Exercises the velocity-stage per-point damping: the leading
            // corner closes while the trailing one opens, so the
            // manifold's MEAN normal velocity cancels and only per-point
            // response (reference physics.cpp:820-867 sequential
            // impulses) damps the rocking mode.
            float ang = 0.25f + 0.15f * hash01(w, i, 0);
            rot = Quat::angleAxis(ang, Vector3 { 0, 1, 0 });
            // center height: edge at z=0 when tilted by ang ->
            // center at (|cos|+|sin|)*0.5; drop from slightly above
            float c_ = cosf(ang), s_ = sinf(ang);
            pos = Vector3 { 0.f, 0.f,
                            0.5f * (c_ + s_) + 0.05f };
        } break;
        case 2: {  // cube_stack: offset vertical stack
            pos = Vector3 {
                0.05f * hash01(w, i, 0),
                0.05f * hash01(w, i, 1),
                0.5f + 1.1f * i,
            };
        } break;
        default:
            FATAL("unknown scenario");
        }

        Entity e = makeBody(pos, rot, vel, 1, ResponseType::Dynamic, i);
        // record init state as tick 0 (g_tick == 0 during construction)
        writeRecord(w, i, ctx.getUnsafe<Position>(e),
                    ctx.getUnsafe<Rotation>(e), vel, Vector3::zero());
    }

    ctx.getSingleton<broadphase::BVH>().rebuildOnUpdate();
}

// ---------------------------------------------------------------------------
// Object manager: unit cube hull (obj 1) + ground plane (obj 0), built
// programmatically (PhysicsLoader::loadHullFromDisk needs the .obj importer
// whose external deps are absent from the snapshot).
// ---------------------------------------------------------------------------

static PhysicsLoader makeObjects()
{
    PhysicsLoader loader(PhysicsLoader::StorageType::CPU, 2);

    // unit cube, half extent 0.5, CCW-from-outside quad faces
    static const Vector3 cube_verts[8] = {
        { -0.5f, -0.5f, -0.5f }, { 0.5f, -0.5f, -0.5f },
        { 0.5f, 0.5f, -0.5f }, { -0.5f, 0.5f, -0.5f },
        { -0.5f, -0.5f, 0.5f }, { 0.5f, -0.5f, 0.5f },
        { 0.5f, 0.5f, 0.5f }, { -0.5f, 0.5f, 0.5f },
    };
    static const uint32_t cube_faces[6][4] = {
        { 0, 3, 2, 1 },  // bottom (z-)
        { 4, 5, 6, 7 },  // top (z+)
        { 0, 1, 5, 4 },  // y-
        { 2, 3, 7, 6 },  // y+
        { 1, 2, 6, 5 },  // x+
        { 3, 0, 4, 7 },  // x-
    };

    geometry::FastPolygonList poly_list {};
    poly_list.allocate(6 * 5);
    for (int f = 0; f < 6; f++) {
        poly_list.addPolygon(Span<const uint32_t>(cube_faces[f], 4));
    }

    geometry::HalfEdgeMesh cube_mesh;
    cube_mesh.construct(poly_list, 8, cube_verts);
    poly_list.free();

    // unit cube inertia: I = m/6 per axis for a cube of side 1, m = 1
    RigidBodyMetadata metadatas[2];
    AABB aabbs[2];
    CollisionPrimitive prims[2];

    // obj 0: plane
    metadatas[0] = RigidBodyMetadata {
        .invInertiaTensor = { 0, 0, 0 },
        .invMass = 0.f,
        .muS = 0.5f,
        .muD = 0.5f,
    };
    aabbs[0] = AABB { { -FLT_MAX, -FLT_MAX, -FLT_MAX },
                      { FLT_MAX, FLT_MAX, FLT_MAX } };
    prims[0].type = CollisionPrimitive::Type::Plane;
    prims[0].plane = CollisionPrimitive::Plane {};

    // obj 1: unit cube
    metadatas[1] = RigidBodyMetadata {
        .invInertiaTensor = { 6.f, 6.f, 6.f },
        .invMass = 1.f,
        .muS = 0.5f,
        .muD = 0.5f,
    };
    aabbs[1] = AABB { { -0.5f, -0.5f, -0.5f }, { 0.5f, 0.5f, 0.5f } };
    prims[1].type = CollisionPrimitive::Type::Hull;
    prims[1].hull.halfEdgeMesh = cube_mesh;

    loader.loadObjects(metadatas, aabbs, prims, 2);
    return loader;
}

}  // namespace golden

using namespace golden;

int main(int argc, char **argv)
{
    if (argc < 6) {
        fprintf(stderr,
                "Usage: %s SCENARIO NUM_WORLDS NUM_TICKS SUBSTEPS OUT.bin "
                "[NUM_BODIES]\n  scenarios: cubes_fall cube_pair cube_stack\n",
                argv[0]);
        return 1;
    }

    std::string scen_name = argv[1];
    int num_worlds = atoi(argv[2]);
    int num_ticks = atoi(argv[3]);
    int substeps = atoi(argv[4]);
    const char *out_path = argv[5];

    int scenario, num_bodies;
    if (scen_name == "cubes_fall") {
        scenario = 0; num_bodies = 4;
    } else if (scen_name == "cube_pair") {
        scenario = 1; num_bodies = 2;
    } else if (scen_name == "cube_stack") {
        scenario = 2; num_bodies = 3;
    } else if (scen_name == "cube_chain") {
        scenario = 3; num_bodies = 2;
    } else if (scen_name == "cube_hinge") {
        scenario = 4; num_bodies = 2;
    } else if (scen_name == "cube_bounce") {
        scenario = 5; num_bodies = 1;
    } else if (scen_name == "cube_rock") {
        scenario = 6; num_bodies = 1;
    } else {
        fprintf(stderr, "unknown scenario %s\n", scen_name.c_str());
        return 1;
    }
    if (argc > 6) num_bodies = atoi(argv[6]);

    GoldenConfig cfg {
        .scenario = scenario,
        .numBodies = num_bodies,
        .numSubsteps = substeps,
        .dt = 1.f / 60.f,
    };

    PhysicsLoader loader = makeObjects();
    GoldenSim::objMgr = &loader.getObjectManager();

    g_W = num_worlds;
    g_K = num_bodies;
    std::vector<float> dump((size_t)(num_ticks + 1) * num_worlds *
                            num_bodies * 13, 0.f);
    g_dump = dump.data();
    g_tick = 0;

    // One single-world engine instance per world, stepped serially (see
    // header comment for why MW mode is unusable in this snapshot).  This
    // mirrors TaskGraphExecutor's per-world RunData construction order
    // (include/madrona/mw_cpu.inl:5-69): register -> build graph -> world.
    struct WorldRun {
        StateManager mgr;
        StateCache cache;
        alignas(GoldenSim) char world_buf[sizeof(GoldenSim)];
        Engine ctx;
        TaskGraph graph;

        WorldRun(const GoldenConfig &cfg, const WorldInit &init)
            : mgr(), cache(),
              ctx((GoldenSim *)world_buf, WorkerInit { &mgr, &cache }),
              graph([this, &cfg]() {
                  void *export_ptrs[8] = {};
                  ECSRegistry registry(&mgr, export_ptrs);
                  GoldenSim::registerTypes(registry, cfg);
                  TaskGraph::Builder builder(ctx);
                  GoldenSim::setupTasks(builder, cfg);
                  return builder.build();
              }())
        {
            new (world_buf) GoldenSim(ctx, cfg, init);
        }
    };

    std::vector<std::unique_ptr<WorldRun>> worlds;
    for (int i = 0; i < num_worlds; i++) {
        worlds.emplace_back(std::make_unique<WorldRun>(
            cfg, WorldInit { (uint32_t)i }));
    }

    for (int t = 1; t <= num_ticks; t++) {
        g_tick = t;
        for (auto &w : worlds) {
            w->graph.run(&w->ctx);
        }
    }

    FILE *f = fopen(out_path, "wb");
    if (!f) { perror("fopen"); return 1; }
    fwrite("GLD1", 1, 4, f);
    int32_t hdr[4] = { num_ticks + 1, num_worlds, num_bodies, substeps };
    fwrite(hdr, sizeof(int32_t), 4, f);
    fwrite(&cfg.dt, sizeof(float), 1, f);
    fwrite(dump.data(), sizeof(float), dump.size(), f);
    fclose(f);

    printf("wrote %s: %d ticks x %d worlds x %d bodies (substeps=%d)\n",
           out_path, num_ticks + 1, num_worlds, num_bodies, substeps);
    return 0;
}
