"""Doc-drift guard: cross-check README/BENCH numbers against artifacts.

Round 3's drift (VERDICT r3 weak #1: a background TPU queue overwrote
checkpoints AFTER the docs quoting them were committed) motivates this
check: every headline number quoted in README.md / BENCH.md must be
derivable from a COMMITTED artifact report. Each claim below names the
artifact JSON, a path into it, and how the number is formatted in the doc;
the check fails if the formatted value no longer appears in the doc text —
i.e. if either the artifact was regenerated without refreshing the doc, or
the doc was edited away from the artifact.

Run directly (`python scripts/check_claims.py`, exit 1 on drift) or via
`tests/test_check_claims.py`. Add a claim whenever a new number is quoted
in the docs.
"""
from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _resolve(obj, path):
    """Walk 'rounds.0.cost_ratio_vs_expert'-style paths. A list segment may
    also be a KEY MATCH '[k1=v1,k2=v2]' selecting the unique row whose
    fields equal the given values (values compared as strings) — positional
    indices into study 'rows' silently shift when a study is rerun with a
    different sweep, so key claims by content, not position."""
    for part in path.split("."):
        if part.startswith("[") and part.endswith("]") and isinstance(obj, list):
            crit = dict(kv.split("=", 1) for kv in part[1:-1].split(","))
            hits = [r for r in obj
                    if all(str(r.get(k)) == v for k, v in crit.items())]
            if len(hits) != 1:
                raise KeyError(f"{part}: matched {len(hits)} rows, need 1")
            obj = hits[0]
        else:
            obj = obj[int(part)] if isinstance(obj, list) else obj[part]
    return obj


def fmt(value, nd=4, comma=False, pct=False):
    if pct:
        return f"{100 * value:g}%"
    s = f"{value:,.{nd}f}" if comma else f"{value:.{nd}f}"
    return s


# (artifact_json, json_path, format kwargs, [docs the formatted value must
#  appear in], human label)
CLAIMS = [
    # --- deep cart-pole distillation ladder (committed full-budget run) ---
    ("artifacts/distilled_deep/report.json", "rounds.0.cost_ratio_vs_expert",
     dict(nd=4), ["BENCH.md", "README.md"], "deep 2-eval 10-seed ratio"),
    ("artifacts/distilled_deep/report.json", "rounds.1.cost_ratio_vs_expert",
     dict(nd=4), ["BENCH.md", "README.md"], "deep 1-eval 10-seed ratio"),
    ("artifacts/distilled_deep/diagnosis.json",
     "ladders.artifacts/distilled_deep.2eval.wide_ratio",
     dict(nd=4), ["BENCH.md", "README.md"], "deep 2-eval 50-seed ratio"),
    ("artifacts/distilled_deep/diagnosis.json",
     "ladders.artifacts/distilled_deep.1eval.wide_ratio",
     dict(nd=4), ["BENCH.md", "README.md"], "deep 1-eval 50-seed ratio"),
    ("artifacts/distilled_deep/diagnosis.json",
     "ladders.artifacts/distilled_deep.2eval.expert_basin_mean_ratio",
     dict(nd=4), ["BENCH.md", "README.md"], "deep 2-eval in-basin ratio"),
    ("artifacts/distilled_deep/diagnosis.json",
     "ladders.artifacts/distilled_deep.1eval.expert_basin_mean_ratio",
     dict(nd=4), ["BENCH.md", "README.md"], "deep 1-eval in-basin ratio"),
    # --- deep-student TPU rates (written by bench_deep_students.py) ---
    ("artifacts/distilled_deep/bench.json", "deep_distilled_1eval_sustained_hz",
     dict(nd=0, comma=True), ["BENCH.md", "README.md"],
     "deep 1-eval sustained Hz"),
    ("artifacts/distilled_deep/bench.json", "deep_distilled_2eval_sustained_hz",
     dict(nd=0, comma=True), ["BENCH.md"], "deep 2-eval sustained Hz"),
    ("artifacts/distilled_deep/bench.json",
     "deep_distilled_1eval_k4_sustained_hz", dict(nd=0, comma=True),
     ["BENCH.md", "README.md"], "deep 1-eval in-kernel K=4 sustained Hz"),
    # --- panda flagship (true RNE closed loop) ---
    ("artifacts/flagship_panda_rbd/report.json",
     "closed_loop_cost_diffusion_mean10", dict(nd=1),
     ["BENCH.md", "README.md"], "panda diffusion closed-loop cost"),
    ("artifacts/flagship_panda_rbd/report.json", "closed_loop_cost_nmpc",
     dict(nd=1), ["BENCH.md", "README.md"], "panda expert closed-loop cost"),
    # --- panda deep ladder (committed full-budget TPU run) ---
    ("artifacts/distilled_panda_deep/report.json",
     "rounds.0.cost_ratio_vs_expert", dict(nd=4), ["README.md"],
     "panda 2-eval ratio"),
    ("artifacts/distilled_panda_deep/report.json",
     "rounds.1.cost_ratio_vs_expert", dict(nd=4), ["README.md"],
     "panda 1-eval ratio"),
    # --- quadrotor guided student, 64-start wide eval ---
    # fraction rows are quoted at 2 decimals in the docs; nd=2 is loose as a
    # string match but tight enough to catch a regenerated artifact moving
    ("artifacts/distilled_quadrotor_guided/wide_eval.json",
     "student_3eval.collision_free_fraction", dict(nd=2),
     ["BENCH.md", "README.md"], "guided 3-eval student CF (64 starts)"),
    ("artifacts/distilled_quadrotor_guided/wide_eval.json",
     "teacher_guided.collision_free_fraction", dict(nd=2),
     ["README.md"], "guided teacher CF (64 starts)"),
    # --- quadrotor safety-first best-of-K ---
    ("artifacts/quadrotor_candidates/report.json",
     "rows.1.collision_free_fraction", dict(nd=2), ["BENCH.md"],
     "guided 3-eval K=4 CF"),
    # --- cart-pole amortization ---
    ("artifacts/amortized/report.json", "amortized_wide.ratio_mean",
     dict(nd=4), ["README.md"], "amortized MLP cost ratio"),
    # --- best-of-K study on the committed deep students ---
    ("artifacts/student_candidates/report.json",
     "rows.[artifact=artifacts/distilled_deep,n_evals=1,K=4].ratio_mean",
     dict(nd=4), ["README.md", "BENCH.md"], "deep 1-eval K=4 ratio"),
    # --- scene-conditioned quadrotor student (held-out scenes, round 4) ---
    ("artifacts/scene_conditioned/report.json",
     "held_out.scene_conditioned_student_k16.collision_free_fraction",
     dict(nd=2), ["BENCH.md", "README.md"], "scene student K=16 CF"),
    ("artifacts/scene_conditioned/report.json",
     "held_out.scene_conditioned_student_k16.safe_reach_fraction",
     dict(nd=2), ["BENCH.md", "README.md"], "scene student K=16 safe-reach"),
    ("artifacts/scene_conditioned/report.json",
     "held_out.teacher_per_scene_guided_oracle.collision_free_fraction",
     dict(nd=2), ["BENCH.md", "README.md"], "scene guided-oracle CF"),
    # --- quadrotor deep ladder, 64-start wide eval (the kept full-budget run)
    ("artifacts/distilled_quadrotor_deep/wide_eval.json",
     "student_2eval.collision_free_fraction", dict(nd=2),
     ["README.md"], "quad deep 2-eval CF (64 starts)"),
    ("artifacts/distilled_quadrotor_deep/wide_eval.json",
     "student_1eval.collision_free_fraction", dict(nd=2),
     ["README.md"], "quad deep 1-eval CF (64 starts)"),
    # --- round 4: truncated candidate selection + in-kernel K + 3D arm ---
    ("artifacts/panda_candidates/report.json",
     "rows.[n_evals=3,K=4,selection_horizon=16].ratio_vs_expert",
     dict(nd=4), ["README.md"], "panda 3-eval K=4 sel_h=16 vs expert"),
    ("artifacts/panda_candidates/report.json",
     "rows.[n_evals=3,K=4,selection_horizon=16].ratio_vs_teacher",
     dict(nd=4), ["README.md"], "panda 3-eval K=4 sel_h=16 vs teacher"),
    ("artifacts/panda_candidates_ext/report.json",
     "rows.[n_evals=1,K=16,selection_horizon=32].ratio_vs_expert",
     dict(nd=4), ["README.md"], "panda 1-eval K=16 sel_h=32 vs expert"),
    ("artifacts/distilled_quadrotor_guided/bench.json",
     "episode_k16_hz_sustained", dict(nd=1, comma=True),
     ["BENCH.md", "README.md"], "quad in-kernel K=16 sustained Hz"),
    ("artifacts/distilled_quadrotor_guided/bench.json",
     "episode_k16.safe_reach_fraction", dict(nd=2),
     ["README.md", "BENCH.md"], "quad in-kernel K=16 safe-reach"),
    # round 5: the K=1 guided-student Hz rows re-pinned to the committed
    # 64-start re-measure (VERDICT r4 weak #2 — the 20 kHz round-3-epoch
    # rows had no surviving artifact backing)
    ("artifacts/distilled_quadrotor_guided/bench.json",
     "episode_hz_sustained", dict(nd=1, comma=True),
     ["BENCH.md", "README.md"], "guided student K=1 kernel sustained Hz"),
    ("artifacts/distilled_quadrotor_guided/bench.json",
     "episode_hz_pipelined", dict(nd=1, comma=True),
     ["BENCH.md"], "guided student K=1 kernel pipelined Hz"),
    ("artifacts/distilled_quadrotor_guided/bench.json",
     "xla_hz_pipelined", dict(nd=1, comma=True),
     ["BENCH.md"], "guided student K=1 XLA Hz"),
    ("artifacts/distilled_quadrotor_guided/bench.json",
     "episode_k4_hz_pipelined", dict(nd=1, comma=True),
     ["BENCH.md", "README.md"], "quad in-kernel K=4 pipelined Hz"),
    ("artifacts/planning3d/metrics.json", "fraction_free",
     dict(nd=2), ["README.md", "BENCH.md"], "planning3d fraction_free"),
    ("artifacts/onpolicy_panda/report.json",
     "rows.[K=1].ratio_vs_expert", dict(nd=4),
     ["README.md"], "onpolicy panda 1-eval K=1 vs expert"),
    ("artifacts/onpolicy_panda/report.json",
     "rows.[K=1].ratio_vs_teacher", dict(nd=4),
     ["README.md"], "onpolicy panda 1-eval K=1 vs teacher"),
    ("artifacts/onpolicy_panda/report.json",
     "rows.[K=16,selection_horizon=32].ratio_vs_expert", dict(nd=4),
     ["README.md"], "onpolicy panda K=16 sel_h=32 vs expert"),
    ("artifacts/distilled_quadrotor_deep/bench.json",
     "xla_k16.safe_reach_fraction", dict(nd=4),
     ["README.md"], "quad deep 1-eval XLA K=16 safe-reach"),
    ("artifacts/distilled_quadrotor_deep/bench.json",
     "xla_k16_hz_pipelined", dict(nd=1, comma=True),
     ["README.md"], "quad deep 1-eval XLA K=16 Hz"),
    ("artifacts/distilled_quadrotor_deep/bench.json",
     "episode_hz_sustained", dict(nd=1, comma=True),
     ["README.md"], "quad deep 1-eval kernel sustained Hz"),
    ("artifacts/scene_conditioned/bench.json", "k16_hz_pipelined",
     dict(nd=1, comma=True), ["BENCH.md", "README.md"],
     "scene serving K=16 Hz"),
    ("artifacts/onpolicy_quadrotor/report.json",
     "rows.[student=onpolicy,K=1].safe_reach_fraction", dict(nd=3),
     ["README.md"], "quad self-distilled K=1 safe-reach"),
    ("artifacts/onpolicy_quadrotor/report.json",
     "rows.[student=onpolicy,K=1].collision_free_fraction", dict(nd=4),
     ["README.md"], "quad self-distilled K=1 CF"),
    ("artifacts/onpolicy_quadrotor/report.json",
     "rows.[student=onpolicy,K=16].safe_reach_fraction", dict(nd=4),
     ["README.md"], "quad self-distilled K=16 safe-reach"),
    ("artifacts/onpolicy_scene/report.json",
     "rows.[student=onpolicy,K=16].safe_reach_fraction", dict(nd=4),
     ["README.md"], "scene self-distilled K=16 safe-reach"),
    ("artifacts/onpolicy_scene/report.json",
     "rows.[student=onpolicy,K=1].collision_free_fraction", dict(nd=4),
     ["README.md"], "scene self-distilled K=1 CF"),
    ("artifacts/onpolicy_quadrotor/bench.json", "episode_hz_sustained",
     dict(nd=1, comma=True), ["README.md"],
     "self-distilled quad K=1 kernel sustained Hz"),
    ("artifacts/onpolicy_quadrotor/bench.json",
     "xla_k16.safe_reach_fraction", dict(nd=4), ["README.md"],
     "self-distilled quad XLA K=16 safe-reach"),
    ("artifacts/onpolicy_quadrotor/bench.json",
     "xla_k16_hz_pipelined", dict(nd=1, comma=True), ["README.md"],
     "self-distilled quad XLA K=16 Hz"),
    ("artifacts/onpolicy_quadrotor/bench.json",
     "episode_k16_hz_pipelined", dict(nd=1, comma=True), ["README.md"],
     "self-distilled quad in-kernel K=16 pipelined Hz"),
    ("artifacts/onpolicy_cartpole/report.json",
     "rows.[student=onpolicy,K=1,n_seeds=50].ratio_mean", dict(nd=5),
     ["README.md"], "cart-pole self-distilled K=1 wide ratio"),
    ("artifacts/onpolicy_cartpole/report.json",
     "rows.[student=onpolicy,K=1,n_seeds=50].ratio_max", dict(nd=5),
     ["README.md"], "cart-pole self-distilled K=1 worst seed"),
    ("artifacts/scene_conditioned/bench.json",
     "k16.collision_free_fraction", dict(nd=1),
     ["BENCH.md"], "scene serving K=16 CF"),
    ("artifacts/flagship_panda_rbd/horizon_diagnosis.json",
     "cumulative_cost_ratio_by_depth.128", dict(nd=1),
     ["README.md"], "panda horizon-decay ratio at depth 128"),
    # --- round 5: scene self-distillation scaled to 544 layouts ---
    ("artifacts/onpolicy_scene_scaled/report.json",
     "rows.[student=before,K=1].collision_free_fraction", dict(nd=4),
     ["README.md"], "scene scaled before K=1 CF (64 starts)"),
    ("artifacts/onpolicy_scene_scaled/report.json",
     "rows.[student=onpolicy,K=1].collision_free_fraction", dict(nd=4),
     ["README.md"], "scene scaled after K=1 CF (64 starts)"),
    ("artifacts/onpolicy_scene_scaled/report.json",
     "rows.[student=onpolicy,K=16].safe_reach_fraction", dict(nd=4),
     ["README.md"], "scene scaled K=16 safe-reach (64 starts)"),
    # --- round 5: canonical-scene station-keeping student ---
    ("artifacts/onpolicy_quadrotor_hold/report.json",
     "rows.[student=onpolicy,K=1,steps=60].safe_reach_fraction", dict(nd=4),
     ["README.md", "BENCH.md"], "quad hold K=1 @60 safe-reach (64 starts)"),
    ("artifacts/onpolicy_quadrotor_hold/report.json",
     "rows.[student=onpolicy,K=1,steps=100].goal_dist_mean", dict(nd=4),
     ["README.md", "BENCH.md"], "quad hold K=1 @100 goal distance"),
    ("artifacts/onpolicy_quadrotor_hold/bench.json",
     "episode_hz_sustained", dict(nd=1, comma=True),
     ["README.md", "BENCH.md"], "quad hold K=1 kernel sustained Hz"),
    ("artifacts/onpolicy_quadrotor_hold/bench.json",
     "episode_k4_hz_pipelined", dict(nd=1, comma=True),
     ["README.md", "BENCH.md"], "quad hold in-kernel K=4 Hz"),
    ("artifacts/onpolicy_quadrotor_hold/bench.json",
     "inkernel_noise_k1_hz_sustained_single_dispatch", dict(nd=1, comma=True),
     ["README.md", "BENCH.md"], "quad hold in-kernel-noise K=1 Hz"),
    # --- round 5: station-keeping scene student (LQR hover labels) ---
    ("artifacts/onpolicy_scene_hold/report.json",
     "rows.[student=onpolicy,K=16,steps=60].safe_reach_fraction", dict(nd=4),
     ["README.md", "BENCH.md"], "scene hold K=16 @60 safe-reach (64 starts)"),
    ("artifacts/onpolicy_scene_hold/report.json",
     "rows.[student=onpolicy,K=16,steps=100].safe_reach_fraction", dict(nd=4),
     ["README.md", "BENCH.md"], "scene hold K=16 @100 safe-reach (64 starts)"),
    ("artifacts/onpolicy_scene_hold/report.json",
     "rows.[student=onpolicy,K=1,steps=60].collision_free_fraction", dict(nd=4),
     ["README.md", "BENCH.md"], "scene hold K=1 @60 CF (64 starts)"),
    ("artifacts/onpolicy_scene_hold/report.json",
     "rows.[student=onpolicy,K=1,steps=100].safe_reach_fraction", dict(nd=4),
     ["README.md", "BENCH.md"], "scene hold K=1 @100 safe-reach (64 starts)"),
    ("artifacts/onpolicy_scene_hold/report.json",
     "rows.[student=onpolicy,K=16,steps=100].goal_dist_mean", dict(nd=4),
     ["README.md"], "scene hold K=16 @100 goal distance"),
    ("artifacts/onpolicy_scene_hold/bench.json",
     "k16.safe_reach_fraction", dict(nd=4),
     ["README.md", "BENCH.md"], "scene hold serving K=16 @60 safe-reach"),
    ("artifacts/onpolicy_scene_hold/bench_100step.json",
     "k16.safe_reach_fraction", dict(nd=4),
     ["README.md", "BENCH.md"], "scene hold serving K=16 @100 safe-reach"),
    ("artifacts/onpolicy_scene_hold/bench_100step.json",
     "k16_hz_pipelined", dict(nd=1, comma=True),
     ["README.md", "BENCH.md"], "scene hold serving K=16 @100 Hz"),
    ("artifacts/onpolicy_scene_hold/bench_100step.json",
     "k1_hz_pipelined", dict(nd=1, comma=True),
     ["README.md", "BENCH.md"], "scene hold serving K=1 @100 Hz"),
    # --- round 5: scene station-keeping chained x2 (hold2) ---
    ("artifacts/onpolicy_scene_hold2/report.json",
     "rows.[student=onpolicy,K=16,steps=60].safe_reach_fraction", dict(nd=4),
     ["README.md", "BENCH.md"], "scene hold2 K=16 @60 safe-reach"),
    ("artifacts/onpolicy_scene_hold2/report.json",
     "rows.[student=onpolicy,K=16,steps=100].goal_dist_mean", dict(nd=4),
     ["README.md", "BENCH.md"], "scene hold2 K=16 @100 goal distance"),
    ("artifacts/onpolicy_scene_hold2/report.json",
     "rows.[student=onpolicy,K=1,steps=60].safe_reach_fraction", dict(nd=4),
     ["README.md", "BENCH.md"], "scene hold2 K=1 @60 safe-reach"),
    ("artifacts/onpolicy_scene_hold2/report.json",
     "rows.[student=onpolicy,K=1,steps=100].safe_reach_fraction", dict(nd=4),
     ["README.md", "BENCH.md"], "scene hold2 K=1 @100 safe-reach"),
    ("artifacts/onpolicy_scene_hold2/bench_100step.json",
     "k16.safe_reach_fraction", dict(nd=4),
     ["README.md", "BENCH.md"], "scene hold2 serving K=16 @100 safe-reach"),
    ("artifacts/onpolicy_scene_hold2/bench.json",
     "k16.safe_reach_fraction", dict(nd=4),
     ["README.md", "BENCH.md"], "scene hold2 serving K=16 @60 safe-reach"),
    # --- round 5: panda DAgger v2 (deployment-policy collection) ---
    ("artifacts/onpolicy_panda_v2/report.json",
     "rows.[K=16,selection_horizon=32].ratio_vs_expert", dict(nd=4),
     ["README.md"], "panda DAgger v2 K=16 sel_h=32 vs expert"),
    ("artifacts/onpolicy_panda_v2/report.json",
     "rows.[K=16,selection_horizon=32].ratio_vs_teacher", dict(nd=4),
     ["README.md"], "panda DAgger v2 K=16 sel_h=32 vs teacher"),
    ("artifacts/onpolicy_panda_v2/report.json",
     "rows.[K=1].ratio_vs_expert", dict(nd=4),
     ["README.md"], "panda DAgger v2 K=1 vs expert"),
    ("artifacts/onpolicy_panda_v2/bench.json", "k1_hz_pipelined",
     dict(nd=1, comma=True), ["README.md"], "panda DAgger v2 K=1 Hz"),
    ("artifacts/onpolicy_panda_v2/bench.json", "k1_hz_sustained",
     dict(nd=1, comma=True), ["README.md"],
     "panda DAgger v2 K=1 sustained Hz"),
    ("artifacts/onpolicy_panda_v2/bench.json", "k16_selh32_hz_sustained",
     dict(nd=1), ["README.md"], "panda DAgger v2 K=16 sel_h=32 Hz"),
    # round 5: the whole-episode articulated-arm kernel
    ("artifacts/onpolicy_panda_v2/bench.json", "episode_hz_pipelined",
     dict(nd=1, comma=True), ["README.md", "BENCH.md"],
     "panda whole-episode kernel pipelined Hz"),
    ("artifacts/onpolicy_panda_v2/bench.json", "episode_hz_sustained",
     dict(nd=1, comma=True), ["README.md", "BENCH.md"],
     "panda whole-episode kernel sustained Hz"),
    ("artifacts/onpolicy_panda_v2/bench.json", "episode_cost_mean10",
     dict(nd=2), ["README.md"], "panda whole-episode kernel cost"),
    ("artifacts/onpolicy_panda_v2/bench.json",
     "episode_k4_selh16_hz_pipelined", dict(nd=1, comma=True),
     ["README.md"], "panda whole-episode in-kernel K=4 Hz"),
    # --- round 5: acrobot long-horizon diagnosis ---
    ("artifacts/flagship_acrobot/horizon_diagnosis.json",
     "expert.max_cost_ratio_lo_over_hi", dict(nd=4),
     ["README.md", "BENCH.md"], "acrobot h32/h256 max cost ratio"),
    ("artifacts/flagship_acrobot/horizon_diagnosis.json",
     "diffusion_400step.mean_cost", dict(nd=2),
     ["README.md"], "acrobot diffusion 400-step mean cost"),
    ("artifacts/flagship_acrobot/horizon_diagnosis.json",
     "modality_theta1.final_theta1.0", dict(nd=4),
     ["README.md"], "acrobot settled theta1"),
    # --- round 5: self-distilled cart-pole measured K/Hz table ---
    ("artifacts/onpolicy_cartpole/bench.json",
     "deep_distilled_1eval_sustained_hz", dict(nd=1, comma=True),
     ["README.md"], "self-distilled cart-pole K=1 sustained Hz"),
    ("artifacts/onpolicy_cartpole/bench.json",
     "deep_distilled_1eval_k4_sustained_hz", dict(nd=1, comma=True),
     ["README.md"], "self-distilled cart-pole in-kernel K=4 sustained Hz"),
    ("artifacts/onpolicy_cartpole/bench.json",
     "deep_distilled_1eval_fused_episode_hz_extra.cost_ratio_vs_expert",
     dict(nd=4), ["README.md"], "self-distilled cart-pole K=1 ratio (bench)"),
    ("artifacts/onpolicy_cartpole/bench.json",
     "deep_distilled_1eval_k4_sustained_hz_extra.cost_ratio_vs_expert_80",
     dict(nd=4), ["README.md"], "self-distilled cart-pole K=4 ratio (bench)"),
    # --- round 5: in-kernel hardware-PRNG noise (single-dispatch K) ---
    ("artifacts/onpolicy_quadrotor/bench.json",
     "inkernel_noise_k8_hz_sustained_single_dispatch",
     dict(nd=1, comma=True), ["BENCH.md", "README.md"],
     "inkernel-noise K=8 single-dispatch Hz"),
    ("artifacts/onpolicy_quadrotor/bench.json",
     "inkernel_noise_k8.safe_reach_fraction", dict(nd=4),
     ["BENCH.md", "README.md"], "inkernel-noise K=8 safe-reach"),
    ("artifacts/onpolicy_quadrotor/bench.json",
     "inkernel_noise_k1_hz_sustained_single_dispatch",
     dict(nd=1, comma=True), ["BENCH.md", "README.md"],
     "inkernel-noise K=1 single-dispatch Hz"),
    ("artifacts/onpolicy_quadrotor/bench.json",
     "inkernel_noise_k12_hz_sustained_single_dispatch",
     dict(nd=1, comma=True), ["BENCH.md"],
     "inkernel-noise K=12 single-dispatch Hz"),
    # --- round 5: scene-conditioned Panda arm (artifacts/scene_panda) ---
    ("artifacts/scene_panda/report.json",
     "rows.[arm=blind].fraction_free", dict(nd=3),
     ["BENCH.md", "README.md"], "scene-panda blind fraction_free"),
    ("artifacts/scene_panda/report.json",
     "rows.[arm=blind+guide].fraction_free", dict(nd=3),
     ["BENCH.md", "README.md"], "scene-panda guided-oracle fraction_free"),
    ("artifacts/scene_panda/report.json",
     "rows.[arm=cond].fraction_free", dict(nd=3),
     ["BENCH.md", "README.md"], "scene-panda conditioned fraction_free"),
    ("artifacts/scene_panda/report.json",
     "rows.[arm=cond+guide].fraction_free", dict(nd=3),
     ["BENCH.md", "README.md"], "scene-panda cond+guide fraction_free"),
    ("artifacts/scene_panda/sample_efficiency.json",
     "rows.[arm=cond].success_at_1", dict(nd=4),
     ["artifacts/scene_panda/README.md"], "scene-panda cond success@1"),
    ("artifacts/scene_panda/sample_efficiency.json",
     "rows.[arm=blind].success_at_1", dict(nd=4),
     ["artifacts/scene_panda/README.md"], "scene-panda blind success@1"),
]


def check(repo=REPO, claims=CLAIMS, verbose=True):
    docs = {}
    failures = []
    for art, path, kw, doc_names, label in claims:
        apath = os.path.join(repo, art)
        if not os.path.exists(apath):
            failures.append(f"{label}: artifact missing: {art}")
            continue
        try:
            value = _resolve(json.load(open(apath)), path)
        except (KeyError, IndexError, TypeError) as e:
            failures.append(f"{label}: {art}:{path} unresolvable ({e!r})")
            continue
        expect = fmt(value, **kw)
        for doc in doc_names:
            if doc not in docs:
                docs[doc] = open(os.path.join(repo, doc)).read()
            # strip the thousands comma variant too: docs may write 19,068
            # or 19068; accept either
            hits = expect in docs[doc] or expect.replace(",", "") in docs[doc]
            if not hits:
                failures.append(
                    f"{label}: {doc} does not contain '{expect}' "
                    f"(from {art}:{path} = {value})")
            elif verbose:
                print(f"ok   {label}: '{expect}' in {doc}")
    # headline: the latest driver-recorded bench value must be quoted in
    # README.md (refresh the results row each round)
    bench_files = sorted(glob.glob(os.path.join(repo, "BENCH_r*.json")))
    if bench_files:
        latest = bench_files[-1]
        parsed = json.load(open(latest)).get("parsed") or {}
        if parsed.get("metric") == "closed_loop_control_hz":
            expect = f"{parsed['value']:,.1f}"
            if "README.md" not in docs:
                docs["README.md"] = open(os.path.join(repo, "README.md")).read()
            if expect not in docs["README.md"] and \
                    expect.replace(",", "") not in docs["README.md"]:
                failures.append(
                    f"headline: README.md does not quote the latest recorded "
                    f"bench value '{expect}' ({os.path.basename(latest)})")
            elif verbose:
                print(f"ok   headline: '{expect}' in README.md "
                      f"({os.path.basename(latest)})")
    return failures


def main():
    failures = check()
    if failures:
        print(f"\n{len(failures)} doc-drift failure(s):", file=sys.stderr)
        for f in failures:
            print(f"  DRIFT {f}", file=sys.stderr)
        sys.exit(1)
    print("all claims verified")


if __name__ == "__main__":
    main()
