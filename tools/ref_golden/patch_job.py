"""Mechanical bitrot fixes for compiling the reference's legacy job system
(src/core/job.cpp — removed from the reference build,
src/core/CMakeLists.txt:3) against the snapshot's current headers.

Two drift classes (see job_main.cpp header for context):
  1. include/madrona/context.hpp declares state_mgr_/state_cache_ BOTH
     inside the MADRONA_USE_JOB_SYSTEM block and after it (the members
     were moved out of the ifdef without deleting the originals) — a
     redefinition error the moment the macro is set.  Fix: guard the
     post-ifdef pair with #ifndef MADRONA_USE_JOB_SYSTEM.
  2. job.cpp uses the pre-refactor Atomic API (store(v, order),
     load(order), fetch_add(v, order)); the snapshot's sync.hpp only has
     the suffixed forms (store_relaxed etc.).  Fix: rewrite relaxed /
     acquire call sites to the suffixed forms (semantically identical).
  3. include/madrona/context.inl wraps the submitImpl / submitNImpl /
     parallelForImpl bodies in #if 0 (disabled when the job system left
     the build; the public submit/parallelFor wrappers outside the block
     still call them).  Fix: gate the block on MADRONA_USE_JOB_SYSTEM
     instead, leaving the dormant ioRead portion disabled (IOManager is
     a legacy skeleton, SURVEY.md L0).
  4. include/madrona/state.inl StateManager::archetype() is
     assert(false) + an #if 0 body referencing the pre-TableStorage
     layout (archetype.tbl / archetype.tbls[world]).  Fix: restore the
     body against the snapshot's TableStorage (tblStorage.tbl /
     tblStorage.tbls[world]).

Usage: python3 patch_job.py <reference_root> <out_dir>
Writes <out_dir>/madrona/context.hpp and <out_dir>/src/job.cpp.
The reference tree is never modified.
"""

import re
import sys


def main():
    ref, out = sys.argv[1], sys.argv[2]

    src = open(f"{ref}/include/madrona/context.hpp").read()
    old = """#endif
    StateManager * const state_mgr_;
    StateCache * const state_cache_;
#ifdef MADRONA_MW_MODE"""
    new = """#endif
#ifndef MADRONA_USE_JOB_SYSTEM
    StateManager * const state_mgr_;
    StateCache * const state_cache_;
#endif
#ifdef MADRONA_MW_MODE"""
    assert src.count(old) == 1, "context.hpp layout changed"
    open(f"{out}/madrona/context.hpp", "w").write(src.replace(old, new))

    src = open(f"{ref}/include/madrona/context.inl").read()
    marker = "// FIXME: implement is_child, dependencies, num_invocations"
    assert src.count(marker) == 1, "context.inl layout changed"
    src = src.replace(marker,
                      "#endif\n\n#ifdef MADRONA_USE_JOB_SYSTEM\n" + marker)
    open(f"{out}/madrona/context.inl", "w").write(src)

    src = open(f"{ref}/include/madrona/state.inl").read()
    old = """    assert(false);
#if 0
    auto archetype_id = archetypeID<ArchetypeT>();

    ArchetypeStore &archetype = *archetype_stores_[archetype_id.id];

    Table &tbl = 
#ifdef MADRONA_MW_MODE
        archetype.tbls[world_id];
#else
        archetype.tbl;
#endif

    return ArchetypeRef<ArchetypeT>(&tbl);
#endif"""
    new = """    auto archetype_id = archetypeID<ArchetypeT>();

    ArchetypeStore &archetype = *archetype_stores_[archetype_id.id];

    Table &tbl =
#ifdef MADRONA_MW_MODE
        archetype.tblStorage.tbls[world_id];
#else
        archetype.tblStorage.tbl;
#endif

    return ArchetypeRef<ArchetypeT>(&tbl);"""
    assert src.count(old) == 1, "state.inl layout changed"
    open(f"{out}/madrona/state.inl", "w").write(src.replace(old, new))
    # quoted #include "state.inl" resolves relative to state.hpp's own
    # directory: mirror state.hpp (verbatim) so the patched .inl wins
    open(f"{out}/madrona/state.hpp", "w").write(
        open(f"{ref}/include/madrona/state.hpp").read())

    src = open(f"{ref}/src/core/job.cpp").read()
    src = src.replace(
        """worker_state.wakeUp.store(~0_u32,
                                                  sync::relaxed);""",
        "worker_state.wakeUp.store_relaxed(~0_u32);")
    src = re.sub(r"\.store\(([^;]+), sync::relaxed\)",
                 r".store_relaxed(\1)", src)
    src = re.sub(r"\.load\(sync::relaxed\)", ".load_relaxed()", src)
    src = re.sub(r"\.load\(sync::acquire\)", ".load_acquire()", src)
    src = re.sub(r"\.fetch_add\(([^;]+), sync::relaxed\)",
                 r".fetch_add_relaxed(\1)", src)
    src = re.sub(r"\.fetch_sub\(([^;]+), sync::relaxed\)",
                 r".fetch_sub_relaxed(\1)", src)
    open(f"{out}/src/job.cpp", "w").write(src)
    print("patched context.hpp + job.cpp")


if __name__ == "__main__":
    main()
