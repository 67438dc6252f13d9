// Legacy job-system golden generator: runs the REFERENCE JobManager
// (src/core/job.cpp, 1668 LoC — in-tree but removed from the build at
// src/core/CMakeLists.txt:3) with the collisions example's dynamic
// fork-join job graph (examples/collisions/collisions.cpp:39-227:
// broadphaseSystem -> narrowphaseSystem -> solverSystem, re-queued
// recursively via simLoop) and dumps per-tick positions + contact counts.
// This makes the "job semantics lowered faithfully to a static taskgraph"
// claim of models/collisions.py binary-backed rather than
// Python-oracle-backed (VERDICT r3 item #3).
//
// The engine sources compile verbatim EXCEPT two mechanical bitrot fixes
// applied by the Makefile's patch rule into obj/patched/ (the snapshot
// removed these APIs after job.cpp was dropped from the build):
//   * include/madrona/context.hpp declares state_mgr_/state_cache_ twice
//     when MADRONA_USE_JOB_SYSTEM is set (the members moved out of the
//     ifdef without deleting the originals) -> guard the duplicates.
//   * job.cpp uses the pre-refactor Atomic API store(v, order) /
//     load(order) / fetch_add(v, order) -> the current *_relaxed() forms.
//
// Example logic below mirrors collisions.cpp with the minimal updates the
// snapshot requires (madrona::utils::SpinLock -> madrona::SpinLock) and
// splitmix64 init instead of std::mt19937 (uniform_real_distribution is
// implementation-defined; splitmix64 is replicated exactly in the test).
// Runs SINGLE-WORKER (deterministic job execution order).
//
// Output format (little-endian):
//   magic "GLDJ" (4 bytes)
//   int32 num_ticks_plus_1, num_objects, 0, 0
//   float dt
//   float rot0[num_objects][4]            (w,x,y,z; constant over time)
//   per tick t = 0..num_ticks:
//     float pos[num_objects][3]
//     int32 num_contacts                  (contacts solved AT tick t; 0 at t=0)

#include <madrona/context.hpp>
#include <madrona/custom_context.hpp>
#include <madrona/math.hpp>

#include <cinttypes>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <vector>

using namespace madrona;
using namespace madrona::math;

namespace JobGolden {

// Components (reference examples/collisions/collisions.hpp:15-43)
struct Translation : Vector3 {
    Translation(Vector3 v) : Vector3(v) {}
};

struct Rotation : Quat {
    Rotation(Quat q) : Quat(q) {}
};

struct PhysicsAABB : AABB {
    PhysicsAABB(AABB b) : AABB(b) {}
};

struct CandidatePair {
    Entity a;
    Entity b;
};

struct ContactData {
    Vector3 normal;
    Entity a;
    Entity b;
};

struct CubeObject : Archetype<Translation, Rotation, PhysicsAABB> {};
struct CollisionCandidate : Archetype<CandidatePair> {};
struct Contact : Archetype<ContactData> {};

class Engine;

static int g_max_ticks = 0;
static int g_num_objects = 0;
static float *g_pos_dump = nullptr;     // [T+1][n][3]
static float *g_rot_dump = nullptr;     // [n][4]
static int32_t *g_contacts_dump = nullptr;  // [T+1]

struct CollisionSim : public WorldBase {
    CollisionSim(Engine &ctx);

    static void entry(Engine &ctx);

    uint64_t tickCount;
    float deltaT;
    AABB worldBounds;

    Query<const Translation, const Rotation, PhysicsAABB>
        physicsPreprocessQuery;
    Query<const Entity, const PhysicsAABB> broadphaseQuery;
    Query<const CandidatePair> candidateQuery;

    SpinLock candidateCreateLock {};
    SpinLock contactCreateLock {};
};

class Engine : public ::madrona::CustomContext<Engine, CollisionSim> {
public:
    using CustomContext::CustomContext;
    inline CollisionSim & sim() { return data(); }
};

// splitmix64 init, replicated bit-exactly in numpy by the test
static inline uint64_t splitmix64(uint64_t x)
{
    x += 0x9E3779B97F4A7C15ull;
    x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9ull;
    x = (x ^ (x >> 27)) * 0x94D049BB133111EBull;
    return x ^ (x >> 31);
}

static inline float hash01(uint32_t slot, uint32_t channel)
{
    uint64_t h = splitmix64(((uint64_t)slot << 8) | channel);
    return (float)(h >> 40) / 16777216.f;
}

CollisionSim::CollisionSim(Engine &ctx)
    : WorldBase(ctx)
{
    tickCount = 0;
    deltaT = 1.f / 60.f;
    worldBounds = {
        .pMin = Vector3 { -10, -10, 0, },
        .pMax = Vector3 { 10, 10, 10, },
    };

    ctx.registerComponent<Translation>();
    ctx.registerComponent<Rotation>();
    ctx.registerComponent<PhysicsAABB>();
    ctx.registerComponent<CandidatePair>();
    ctx.registerComponent<ContactData>();

    ctx.registerArchetype<CubeObject>();
    ctx.registerArchetype<CollisionCandidate>();
    ctx.registerArchetype<Contact>();

    physicsPreprocessQuery =
        ctx.query<const Translation, const Rotation, PhysicsAABB>();
    broadphaseQuery = ctx.query<const Entity, const PhysicsAABB>();
    candidateQuery = ctx.query<const CandidatePair>();

    Vector3 lo = worldBounds.pMin, hi = worldBounds.pMax;
    for (int i = 0; i < g_num_objects; i++) {
        Vector3 pos {
            lo.x + (hi.x - lo.x) * hash01(i, 0),
            lo.y + (hi.y - lo.y) * hash01(i, 1),
            lo.z + (hi.z - lo.z) * hash01(i, 2),
        };
        float ang = (float)M_PI * hash01(i, 3);
        Quat rot = Quat::angleAxis(ang, Vector3 { 0, 1, 0 });
        PhysicsAABB aabb = AABB::invalid();
        ctx.makeEntityNow<CubeObject>(Translation { pos }, Rotation { rot },
                                      aabb);
        float *pd = g_pos_dump + i * 3;
        pd[0] = pos.x; pd[1] = pos.y; pd[2] = pos.z;
        float *rd = g_rot_dump + i * 4;
        rd[0] = rot.w; rd[1] = rot.x; rd[2] = rot.y; rd[3] = rot.z;
    }
}

// broadphaseSystem (reference collisions.cpp:89-138): AABB preprocess of
// the "fake 2*unit cube" (corners at +-1), then the nested all-pairs
// overlap parallelFor creating CollisionCandidate rows.
static JobID broadphaseSystem(Engine &ctx)
{
    JobID preprocess = ctx.parallelFor(ctx.sim().physicsPreprocessQuery,
            [](Engine &, const Translation &translation,
               const Rotation &rotation, PhysicsAABB &aabb) {
        Mat3x4 model_mat = Mat3x4::fromTRS(translation, rotation);

        Vector3 cube[8] = {
            model_mat.txfmPoint(Vector3 {-1.f, -1.f, -1.f}),
            model_mat.txfmPoint(Vector3 { 1.f, -1.f, -1.f}),
            model_mat.txfmPoint(Vector3 { 1.f,  1.f, -1.f}),
            model_mat.txfmPoint(Vector3 {-1.f,  1.f, -1.f}),
            model_mat.txfmPoint(Vector3 {-1.f, -1.f,  1.f}),
            model_mat.txfmPoint(Vector3 { 1.f, -1.f,  1.f}),
            model_mat.txfmPoint(Vector3 { 1.f,  1.f,  1.f}),
            model_mat.txfmPoint(Vector3 {-1.f,  1.f,  1.f}),
        };

        aabb = AABB::point(cube[0]);
        for (int i = 1; i < 8; i++) {
            aabb.expand(cube[i]);
        }
    });

    return ctx.parallelFor(ctx.sim().broadphaseQuery,
            [](Engine &ctx, Entity a, const PhysicsAABB &a_bbox) {
        ctx.parallelFor(ctx.sim().broadphaseQuery,
                [a, &a_bbox](Engine &ctx, Entity b,
                             const PhysicsAABB &b_bbox) {
            if (a == b) {
                return;
            }
            if (a_bbox.overlaps(b_bbox)) {
                std::lock_guard lock(ctx.sim().candidateCreateLock);
                ctx.makeEntityNow<CollisionCandidate>(CandidatePair { a, b });
            }
        });
    }, true, preprocess);
}

// narrowphaseSystem (reference collisions.cpp:140-169): contact normal =
// normalize(b - a); candidates cleared afterwards.
static JobID narrowphaseSystem(Engine &ctx, JobID broadphase_job)
{
    JobID contact_job = ctx.parallelFor(ctx.sim().candidateQuery,
            [](Engine &ctx, const CandidatePair &pair) {
        Translation a_pos = ctx.get<Translation>(pair.a).value();
        Translation b_pos = ctx.get<Translation>(pair.b).value();

        Vector3 to_b = (b_pos - a_pos).normalize();
        {
            std::lock_guard lock(ctx.sim().contactCreateLock);
            ctx.makeEntityNow<Contact>(ContactData { to_b, pair.a, pair.b });
        }
    }, true, broadphase_job);

    return ctx.submit([](Engine &ctx) {
        ctx.clearArchetype<CollisionCandidate>();
    }, true, contact_job);
}

// solverSystem (reference collisions.cpp:171-200): serial +-normal push,
// then Contact clear.  The dump happens here, before the clear, with
// the tick's contact count.
static JobID solverSystem(Engine &ctx, JobID narrowphase_job)
{
    return ctx.submit([](Engine &ctx) {
        auto contacts = ctx.archetype<Contact>();
        int num_contacts = (int)contacts.size();
        ContactData *contacts_data = contacts.component<ContactData>().data();

        for (int i = 0; i < num_contacts; i++) {
            ContactData &contact = contacts_data[i];
            Translation &a_pos = ctx.get<Translation>(contact.a).value();
            Translation &b_pos = ctx.get<Translation>(contact.b).value();
            a_pos -= contact.normal;
            b_pos += contact.normal;
        }

        ctx.clearArchetype<Contact>();

        // dump: tickCount was incremented by the enqueue job before this
        // child ran, so the state here is END of tick (tickCount).
        int t = (int)ctx.sim().tickCount;
        auto cubes = ctx.archetype<CubeObject>();
        Translation *pos = cubes.component<Translation>().data();
        float *dst = g_pos_dump + (size_t)t * g_num_objects * 3;
        for (int i = 0; i < g_num_objects; i++) {
            dst[i * 3 + 0] = pos[i].x;
            dst[i * 3 + 1] = pos[i].y;
            dst[i * 3 + 2] = pos[i].z;
        }
        g_contacts_dump[t] = num_contacts;
    }, true, narrowphase_job);
}

static void tick(Engine &ctx)
{
    JobID broadphase_job = broadphaseSystem(ctx);
    JobID narrowphase_job = narrowphaseSystem(ctx, broadphase_job);
    solverSystem(ctx, narrowphase_job);
}

// simLoop (reference collisions.cpp:202-218), bounded at g_max_ticks
static void simLoop(Engine &ctx)
{
    ctx.submit([](Engine &ctx) {
        tick(ctx);
        ctx.sim().tickCount += 1;
        if ((int)ctx.sim().tickCount < g_max_ticks) {
            simLoop(ctx);
        }
    }, false, ctx.currentJobID());
}

void CollisionSim::entry(Engine &ctx)
{
    CollisionSim &sim = ctx.sim();
    new (&sim) CollisionSim(ctx);
    simLoop(ctx);
}

}  // namespace JobGolden

using namespace JobGolden;

int main(int argc, char **argv)
{
    if (argc < 4) {
        fprintf(stderr, "Usage: %s NUM_OBJECTS NUM_TICKS OUT.bin\n", argv[0]);
        return 1;
    }
    g_num_objects = atoi(argv[1]);
    g_max_ticks = atoi(argv[2]);
    const char *out_path = argv[3];

    std::vector<float> pos_dump((size_t)(g_max_ticks + 1) * g_num_objects * 3,
                                0.f);
    std::vector<float> rot_dump((size_t)g_num_objects * 4, 0.f);
    std::vector<int32_t> contacts_dump(g_max_ticks + 1, 0);
    g_pos_dump = pos_dump.data();
    g_rot_dump = rot_dump.data();
    g_contacts_dump = contacts_dump.data();

    {
        StateManager state_mgr;
        // 1 worker, 0 IO threads, no pinning: deterministic execution order
        JobManager job_mgr(JobManager::makeEntry<Engine>(
            [](Engine &ctx) {
                CollisionSim::entry(ctx);
            }), 1, 0, &state_mgr, false);
        job_mgr.waitForAllFinished();
    }

    FILE *f = fopen(out_path, "wb");
    if (!f) { perror("fopen"); return 1; }
    fwrite("GLDJ", 1, 4, f);
    int32_t hdr[4] = { g_max_ticks + 1, g_num_objects, 0, 0 };
    fwrite(hdr, sizeof(int32_t), 4, f);
    float dt = 1.f / 60.f;
    fwrite(&dt, sizeof(float), 1, f);
    fwrite(rot_dump.data(), sizeof(float), rot_dump.size(), f);
    for (int t = 0; t <= g_max_ticks; t++) {
        fwrite(pos_dump.data() + (size_t)t * g_num_objects * 3,
               sizeof(float), (size_t)g_num_objects * 3, f);
        fwrite(&contacts_dump[t], sizeof(int32_t), 1, f);
    }
    fclose(f);

    printf("wrote %s: %d ticks x %d objects (job system, 1 worker)\n",
           out_path, g_max_ticks + 1, g_num_objects);
    return 0;
}
