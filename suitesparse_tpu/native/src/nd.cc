// Nested dissection ordering — multilevel vertex-separator bisection.
//
// TPU-build equivalent of the reference's graph-partition ordering stack:
// METIS_NodeND (vendored metis-5.1.0, wrapped by CHOLMOD/Partition/
// cholmod_metis.c:486) and CHOLMOD's own NESDIS (cholmod_nesdis.c) with
// Mongoose-style multilevel machinery (Mongoose_Coarsening/Matching/
// ImproveFM.cpp). Implemented from the published multilevel scheme
// (Karypis-Kumar; Hendrickson-Leland): heavy-edge matching coarsening, BFS
// region-growing initial bisection from a pseudo-peripheral vertex,
// Fiduccia-Mattheyses boundary refinement on uncoarsening, minimum-vertex-
// cover separator extraction from the edge cut, then recursion with AMD on
// small leaf subgraphs (NESDIS's strategy). Fresh code throughout.
//
// Input: symmetric pattern of A+A' in CSC, no diagonal. Output: perm[k] =
// k-th pivot (separators ordered last, recursively).

#include "common.h"
#include <random>
#include <functional>

extern "C" i64 sstpu_amd(i64 n, const i64* Ap, const i64* Ai, i64* perm,
                         double dense, i64 aggressive);

namespace {

struct Graph {
  i64 n = 0;
  std::vector<i64> xadj, adj, ewgt, vwgt;
  i64 total_vwgt = 0;
};

// Build the coarse graph from a matching: map[v] = coarse id.
Graph contract(const Graph& g, const std::vector<i64>& cmap, i64 cn) {
  Graph cg;
  cg.n = cn;
  cg.vwgt.assign(cn, 0);
  for (i64 v = 0; v < g.n; v++) cg.vwgt[cmap[v]] += g.vwgt[v];
  cg.total_vwgt = g.total_vwgt;
  cg.xadj.assign(cn + 1, 0);
  std::vector<i64> tmp_head(cn, -1), tmp_wgt, tmp_id;
  std::vector<std::pair<i64, i64>> edges;  // (coarse neighbor, weight) scratch
  std::vector<i64> marker(cn, -1), accum(cn, 0);
  // two-pass: count then fill (with dedup via marker)
  std::vector<std::vector<std::pair<i64, i64>>> rows(cn);
  for (i64 v = 0; v < g.n; v++) {
    i64 cv = cmap[v];
    for (i64 p = g.xadj[v]; p < g.xadj[v + 1]; p++) {
      i64 cu = cmap[g.adj[p]];
      if (cu == cv) continue;
      rows[cv].push_back({cu, g.ewgt.empty() ? 1 : g.ewgt[p]});
    }
  }
  for (i64 c = 0; c < cn; c++) {
    auto& r = rows[c];
    std::sort(r.begin(), r.end());
    i64 w = 0;
    for (size_t t = 0; t < r.size(); t++) {
      w += r[t].second;
      if (t + 1 == r.size() || r[t + 1].first != r[t].first) {
        cg.adj.push_back(r[t].first);
        cg.ewgt.push_back(w);
        w = 0;
      }
    }
    cg.xadj[c + 1] = (i64)cg.adj.size();
  }
  return cg;
}

// Heavy-edge matching; returns coarse size and cmap.
i64 match(const Graph& g, std::vector<i64>& cmap, std::mt19937_64& rng) {
  std::vector<i64> order(g.n);
  for (i64 i = 0; i < g.n; i++) order[i] = i;
  std::shuffle(order.begin(), order.end(), rng);
  cmap.assign(g.n, -1);
  i64 cn = 0;
  for (i64 v : order) {
    if (cmap[v] != -1) continue;
    i64 best = -1, bestw = -1;
    for (i64 p = g.xadj[v]; p < g.xadj[v + 1]; p++) {
      i64 u = g.adj[p];
      if (cmap[u] != -1 || u == v) continue;
      i64 w = g.ewgt.empty() ? 1 : g.ewgt[p];
      if (w > bestw) { bestw = w; best = u; }
    }
    cmap[v] = cn;
    if (best != -1) cmap[best] = cn;
    cn++;
  }
  return cn;
}

// BFS region growing from a pseudo-peripheral vertex; side[v] in {0,1}.
void initial_bisect(const Graph& g, std::vector<char>& side,
                    std::mt19937_64& rng) {
  side.assign(g.n, 1);
  if (g.n == 0) return;
  // pseudo-peripheral: BFS twice
  i64 start = (i64)(rng() % g.n);
  std::vector<i64> dist(g.n), queue(g.n);
  for (int rep = 0; rep < 2; rep++) {
    std::fill(dist.begin(), dist.end(), (i64)-1);
    i64 qh = 0, qt = 0;
    queue[qt++] = start;
    dist[start] = 0;
    i64 last = start;
    while (qh < qt) {
      i64 v = queue[qh++];
      last = v;
      for (i64 p = g.xadj[v]; p < g.xadj[v + 1]; p++) {
        i64 u = g.adj[p];
        if (dist[u] == -1) { dist[u] = dist[v] + 1; queue[qt++] = u; }
      }
    }
    start = last;
  }
  // grow region 0 from `start` until half the total vertex weight
  std::fill(dist.begin(), dist.end(), (i64)-1);
  i64 qh = 0, qt = 0;
  queue[qt++] = start;
  dist[start] = 0;
  i64 grown = 0, target = g.total_vwgt / 2;
  while (qh < qt && grown < target) {
    i64 v = queue[qh++];
    side[v] = 0;
    grown += g.vwgt[v];
    for (i64 p = g.xadj[v]; p < g.xadj[v + 1]; p++) {
      i64 u = g.adj[p];
      if (dist[u] == -1) { dist[u] = dist[v] + 1; queue[qt++] = u; }
    }
  }
  // disconnected leftovers: they stay on side 1
}

// A few FM passes of single-vertex moves with balance tolerance.
void refine(const Graph& g, std::vector<char>& side) {
  if (g.n == 0) return;
  i64 w0 = 0;
  for (i64 v = 0; v < g.n; v++) if (side[v] == 0) w0 += g.vwgt[v];
  i64 W = g.total_vwgt;
  double lo = 0.40 * W, hi = 0.60 * W;
  std::vector<i64> gain(g.n);
  for (int pass = 0; pass < 4; pass++) {
    bool any = false;
    for (i64 v = 0; v < g.n; v++) {
      i64 ext = 0, in = 0;
      for (i64 p = g.xadj[v]; p < g.xadj[v + 1]; p++) {
        i64 w = g.ewgt.empty() ? 1 : g.ewgt[p];
        if (side[g.adj[p]] != side[v]) ext += w; else in += w;
      }
      i64 gv = ext - in;
      if (gv <= 0) continue;
      i64 nw0 = side[v] == 0 ? w0 - g.vwgt[v] : w0 + g.vwgt[v];
      if (nw0 < lo || nw0 > hi) continue;
      side[v] ^= 1;
      w0 = nw0;
      any = true;
    }
    if (!any) break;
  }
  // keep balance sane even if refinement drifted
  (void)lo; (void)hi;
}

// Vertex separator from the edge cut: MINIMUM vertex cover of the cut's
// bipartite graph via maximum matching + König's theorem (the quality step
// METIS's node-separator refinement approximates; exact here because the
// boundary graphs are small).
void separator(const Graph& g, const std::vector<char>& side,
               std::vector<char>& insep) {
  insep.assign(g.n, 0);
  // boundary vertices per side, with local ids
  std::vector<i64> lid(g.n, -1), bu, bv;
  for (i64 v = 0; v < g.n; v++)
    for (i64 p = g.xadj[v]; p < g.xadj[v + 1]; p++)
      if (side[g.adj[p]] != side[v]) {
        if (lid[v] == -1) {
          if (side[v] == 0) { lid[v] = (i64)bu.size(); bu.push_back(v); }
          else { lid[v] = (i64)bv.size(); bv.push_back(v); }
        }
        break;
      }
  i64 nu = (i64)bu.size(), nv = (i64)bv.size();
  if (nu == 0 || nv == 0) return;
  // adjacency bu -> bv over cut edges
  std::vector<std::vector<i64>> adj(nu);
  for (i64 iu = 0; iu < nu; iu++) {
    i64 v = bu[iu];
    for (i64 p = g.xadj[v]; p < g.xadj[v + 1]; p++) {
      i64 u = g.adj[p];
      if (side[u] != side[v]) adj[iu].push_back(lid[u]);
    }
  }
  // max bipartite matching (augmenting DFS)
  std::vector<i64> mu(nu, -1), mv(nv, -1);
  std::vector<i64> seen(nv, -1);
  std::function<bool(i64, i64)> aug = [&](i64 iu, i64 stamp) -> bool {
    for (i64 iv : adj[iu]) {
      if (seen[iv] == stamp) continue;
      seen[iv] = stamp;
      if (mv[iv] == -1 || aug(mv[iv], stamp)) {
        mu[iu] = iv;
        mv[iv] = iu;
        return true;
      }
    }
    return false;
  };
  for (i64 iu = 0; iu < nu; iu++) aug(iu, iu);
  // König: Z = U-vertices unmatched + all reachable by alternating paths
  std::vector<char> zu(nu, 0), zv(nv, 0);
  std::vector<i64> stack;
  for (i64 iu = 0; iu < nu; iu++)
    if (mu[iu] == -1) { zu[iu] = 1; stack.push_back(iu); }
  while (!stack.empty()) {
    i64 iu = stack.back();
    stack.pop_back();
    for (i64 iv : adj[iu]) {
      if (zv[iv]) continue;
      zv[iv] = 1;  // via non-matching edge
      i64 iw = mv[iv];
      if (iw != -1 && !zu[iw]) { zu[iw] = 1; stack.push_back(iw); }
    }
  }
  // minimum cover = (U \ Z) ∪ (V ∩ Z)
  for (i64 iu = 0; iu < nu; iu++) if (!zu[iu]) insep[bu[iu]] = 1;
  for (i64 iv = 0; iv < nv; iv++) if (zv[iv]) insep[bv[iv]] = 1;
}

struct NDContext {
  i64 nd_small;
  std::mt19937_64 rng;
  i64* perm;
};

// Order subgraph (vertices vmap into the original) into perm[lo..hi).
void nd_recurse(NDContext& ctx, Graph g, std::vector<i64> vmap,
                i64 lo, i64 hi) {
  i64 n = g.n;
  if (n == 0) return;
  if (n <= ctx.nd_small) {
    // leaf: AMD on the subgraph (NESDIS strategy)
    std::vector<i64> p(n);
    if (sstpu_amd(n, g.xadj.data(), g.adj.data(), p.data(), 10.0, 1) != 0)
      for (i64 i = 0; i < n; i++) p[i] = i;
    for (i64 k = 0; k < n; k++) ctx.perm[lo + k] = vmap[p[k]];
    return;
  }
  // multilevel bisection
  std::vector<Graph> levels;
  std::vector<std::vector<i64>> cmaps;
  levels.push_back(std::move(g));
  while (levels.back().n > 100) {
    std::vector<i64> cmap;
    i64 cn = match(levels.back(), cmap, ctx.rng);
    if (cn > levels.back().n * 9 / 10) break;  // stalled
    Graph cg = contract(levels.back(), cmap, cn);
    cmaps.push_back(std::move(cmap));
    levels.push_back(std::move(cg));
  }
  std::vector<char> side;
  initial_bisect(levels.back(), side, ctx.rng);
  refine(levels.back(), side);
  for (i64 l = (i64)levels.size() - 2; l >= 0; l--) {
    std::vector<char> fine(levels[l].n);
    for (i64 v = 0; v < levels[l].n; v++) fine[v] = side[cmaps[l][v]];
    side.swap(fine);
    refine(levels[l], side);
  }
  Graph& fg = levels[0];
  std::vector<char> insep;
  separator(fg, side, insep);
  // split into parts
  std::vector<i64> id(fg.n, -1);
  std::vector<i64> a_nodes, b_nodes, s_nodes;
  for (i64 v = 0; v < fg.n; v++) {
    if (insep[v]) s_nodes.push_back(v);
    else if (side[v] == 0) a_nodes.push_back(v);
    else b_nodes.push_back(v);
  }
  if (s_nodes.empty() && (a_nodes.empty() || b_nodes.empty())) {
    // no progress (graph likely disconnected into one side): AMD fallback
    std::vector<i64> p(fg.n);
    if (sstpu_amd(fg.n, fg.xadj.data(), fg.adj.data(), p.data(), 10.0, 1)
        != 0)
      for (i64 i = 0; i < fg.n; i++) p[i] = i;
    for (i64 k = 0; k < fg.n; k++) ctx.perm[lo + k] = vmap[p[k]];
    return;
  }
  auto build_sub = [&](const std::vector<i64>& nodes, Graph& sg,
                       std::vector<i64>& svmap) {
    i64 sn = (i64)nodes.size();
    for (i64 k = 0; k < sn; k++) id[nodes[k]] = k;
    sg.n = sn;
    sg.vwgt.assign(sn, 1);
    sg.total_vwgt = sn;
    sg.xadj.assign(sn + 1, 0);
    sg.adj.clear();
    sg.ewgt.clear();
    svmap.resize(sn);
    for (i64 k = 0; k < sn; k++) {
      i64 v = nodes[k];
      svmap[k] = vmap[v];
      for (i64 p = fg.xadj[v]; p < fg.xadj[v + 1]; p++) {
        i64 u = fg.adj[p];
        if (!insep[u] && side[u] == side[v]) sg.adj.push_back(id[u]);
      }
      sg.xadj[k + 1] = (i64)sg.adj.size();
    }
    for (i64 k = 0; k < sn; k++) id[nodes[k]] = -1;
  };
  i64 na = (i64)a_nodes.size(), nb = (i64)b_nodes.size(),
      ns = (i64)s_nodes.size();
  // separator ordered last within [lo, hi)
  for (i64 k = 0; k < ns; k++) ctx.perm[hi - ns + k] = vmap[s_nodes[k]];
  Graph ga, gb;
  std::vector<i64> va, vb;
  build_sub(a_nodes, ga, va);
  build_sub(b_nodes, gb, vb);
  levels.clear();  // free memory before recursing
  nd_recurse(ctx, std::move(ga), std::move(va), lo, lo + na);
  nd_recurse(ctx, std::move(gb), std::move(vb), lo + na, lo + na + nb);
}

}  // namespace

SSTPU_API i64 sstpu_nested_dissection(i64 n, const i64* Ap, const i64* Ai,
                                      i64* perm, i64 nd_small, i64 seed) {
  if (n <= 0) return 0;
  Graph g;
  g.n = n;
  g.xadj.assign(Ap, Ap + n + 1);
  g.adj.assign(Ai, Ai + Ap[n]);
  g.vwgt.assign(n, 1);
  g.total_vwgt = n;
  NDContext ctx;
  ctx.nd_small = std::max<i64>(nd_small, 16);
  ctx.rng.seed((uint64_t)seed);
  ctx.perm = perm;
  std::vector<i64> vmap(n);
  for (i64 i = 0; i < n; i++) vmap[i] = i;
  nd_recurse(ctx, std::move(g), std::move(vmap), 0, n);
  return 0;
}
