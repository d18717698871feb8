// Native byte-pair-encoding merge engine.
//
// TPU-native counterpart of the reference stack's Rust `tokenizers` hot path:
// Python handles file loading and GPT-2-style byte-level pre-tokenization
// (unicode regex), this library runs the O(n log n) merge loop per pre-token.
// Exposed through a minimal C ABI consumed via ctypes (no pybind11 in the
// image).
//
// Protocol: the host passes the vocabulary as parallel arrays of symbol
// strings and ids, merges as ranked pairs, and each encode call passes one
// pre-token as a sequence of initial symbol indices.

#include <cstdint>
#include <cstring>
#include <queue>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct PairHash {
    size_t operator()(const std::pair<int32_t, int32_t>& p) const {
        return std::hash<int64_t>()((int64_t(p.first) << 32) ^ uint32_t(p.second));
    }
};

struct Tokenizer {
    std::vector<std::string> symbols;                 // idx -> symbol text
    std::unordered_map<std::string, int32_t> sym_id;  // symbol text -> idx
    std::vector<int32_t> token_ids;                   // idx -> vocab id
    // (left_sym, right_sym) -> (rank, merged_sym)
    std::unordered_map<std::pair<int32_t, int32_t>,
                       std::pair<int32_t, int32_t>, PairHash> merges;
};

int32_t intern(Tokenizer* t, const char* text, int32_t vocab_id) {
    auto it = t->sym_id.find(text);
    if (it != t->sym_id.end()) return it->second;
    int32_t idx = (int32_t)t->symbols.size();
    t->symbols.emplace_back(text);
    t->sym_id.emplace(text, idx);
    t->token_ids.push_back(vocab_id);
    return idx;
}

}  // namespace

extern "C" {

void* bpe_new() { return new Tokenizer(); }
void bpe_free(void* h) { delete static_cast<Tokenizer*>(h); }

// Register a vocabulary symbol. Returns its internal index.
int32_t bpe_add_symbol(void* h, const char* text, int32_t vocab_id) {
    return intern(static_cast<Tokenizer*>(h), text, vocab_id);
}

// Register a merge rule: left + right -> merged, with priority `rank`
// (lower rank merges first). Symbols must already be registered.
int32_t bpe_add_merge(void* h, const char* left, const char* right,
                      int32_t rank) {
    auto* t = static_cast<Tokenizer*>(h);
    auto li = t->sym_id.find(left);
    auto ri = t->sym_id.find(right);
    if (li == t->sym_id.end() || ri == t->sym_id.end()) return -1;
    std::string merged = std::string(left) + right;
    auto mi = t->sym_id.find(merged);
    if (mi == t->sym_id.end()) return -2;
    t->merges[{li->second, ri->second}] = {rank, mi->second};
    return 0;
}

// Encode one pre-token given as `n` initial symbol indices in `syms`.
// Writes up to `cap` vocab ids into `out`; returns the count (or -1).
int32_t bpe_encode(void* h, const int32_t* syms, int32_t n, int32_t* out,
                   int32_t cap) {
    auto* t = static_cast<Tokenizer*>(h);
    if (n <= 0) return 0;

    // doubly linked list over live positions
    std::vector<int32_t> sym(syms, syms + n);
    std::vector<int32_t> prev(n), next(n);
    std::vector<bool> alive(n, true);
    for (int32_t i = 0; i < n; ++i) { prev[i] = i - 1; next[i] = i + 1 < n ? i + 1 : -1; }

    struct Cand { int32_t rank, pos, left_sym, right_sym; };
    struct Cmp {
        bool operator()(const Cand& a, const Cand& b) const {
            if (a.rank != b.rank) return a.rank > b.rank;
            return a.pos > b.pos;  // ties: leftmost first
        }
    };
    std::priority_queue<Cand, std::vector<Cand>, Cmp> heap;

    auto push = [&](int32_t i) {
        int32_t j = next[i];
        if (j < 0) return;
        auto it = t->merges.find({sym[i], sym[j]});
        if (it != t->merges.end())
            heap.push({it->second.first, i, sym[i], sym[j]});
    };
    for (int32_t i = 0; i < n; ++i) push(i);

    while (!heap.empty()) {
        Cand c = heap.top();
        heap.pop();
        int32_t i = c.pos, j = next[i];
        // stale entries: position dead or symbols changed since queued
        if (!alive[i] || j < 0 || !alive[j] ||
            sym[i] != c.left_sym || sym[j] != c.right_sym)
            continue;
        auto it = t->merges.find({sym[i], sym[j]});
        if (it == t->merges.end() || it->second.first != c.rank) continue;

        sym[i] = it->second.second;  // merged symbol
        alive[j] = false;
        next[i] = next[j];
        if (next[j] >= 0) prev[next[j]] = i;
        if (prev[i] >= 0) push(prev[i]);
        push(i);
    }

    int32_t count = 0;
    for (int32_t i = 0; i != -1 && i < n; i = next[i]) {
        if (!alive[i]) continue;
        if (count >= cap) return -1;
        out[count++] = t->token_ids[sym[i]];
    }
    return count;
}

// Batched encode: `syms` holds all pieces back to back; `offsets` has
// n_pieces+1 entries delimiting them. Output ids are written back to back
// into `out` (capacity `cap`); `out_offsets` (n_pieces+1) receives the
// per-piece boundaries. Returns total ids written, or -1 on overflow.
int32_t bpe_encode_batch(void* h, const int32_t* syms,
                         const int32_t* offsets, int32_t n_pieces,
                         int32_t* out, int32_t cap, int32_t* out_offsets) {
    int32_t total = 0;
    out_offsets[0] = 0;
    for (int32_t p = 0; p < n_pieces; ++p) {
        int32_t n = offsets[p + 1] - offsets[p];
        int32_t wrote = bpe_encode(h, syms + offsets[p], n, out + total,
                                   cap - total);
        if (wrote < 0) return -1;
        total += wrote;
        out_offsets[p + 1] = total;
    }
    return total;
}

}  // extern "C"
