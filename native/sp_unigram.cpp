// Native SentencePiece unigram encoder for easynlp_tpu.
//
// Port of the pure-Python Viterbi in
// easynlp_tpu/modelzoo/tokenization_sentencepiece.py::_encode_unigram
// (itself the reference's sentencepiece dependency — reference
// requirements.txt sentencepiece>=0.1.91): byte-level piece trie, DP over
// byte positions (unknown steps advance whole UTF-8 characters), consecutive
// unknowns fuse into one surface, byte pieces replace unk when present.
// Text arrives already normalized (the charsmap/NFKC path stays in Python).

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Trie {
  // node -> 256-ary sparse edges stored as sorted (byte, child) pairs
  std::vector<std::vector<std::pair<uint8_t, int32_t>>> edges;
  std::vector<int32_t> piece_id;  // -1 when not terminal

  Trie() {
    edges.emplace_back();
    piece_id.push_back(-1);
  }

  int32_t child(int32_t node, uint8_t b) const {
    const auto& e = edges[node];
    int lo = 0, hi = (int)e.size() - 1;
    while (lo <= hi) {
      int mid = (lo + hi) / 2;
      if (e[mid].first == b) return e[mid].second;
      if (e[mid].first < b) lo = mid + 1; else hi = mid - 1;
    }
    return -1;
  }

  void insert(const char* s, size_t n, int32_t pid) {
    int32_t node = 0;
    for (size_t i = 0; i < n; ++i) {
      uint8_t b = (uint8_t)s[i];
      int32_t nxt = child(node, b);
      if (nxt < 0) {
        nxt = (int32_t)edges.size();
        edges.emplace_back();
        piece_id.push_back(-1);
        auto& e = edges[node];
        auto it = e.begin();
        while (it != e.end() && it->first < b) ++it;
        e.insert(it, {b, nxt});
      }
      node = nxt;
    }
    piece_id[node] = pid;
  }
};

struct Model {
  Trie trie;
  std::vector<double> scores;
  double unk_score = 0.0;
  int32_t unk_id = 0;
  bool has_bytes = false;
  int32_t byte_ids[256];
};

inline int utf8_len(uint8_t b) {
  if (b < 0x80) return 1;
  if ((b >> 5) == 0x6) return 2;
  if ((b >> 4) == 0xe) return 3;
  if ((b >> 3) == 0x1e) return 4;
  return 1;  // invalid byte: treat as one char (matches python fallback)
}

}  // namespace

extern "C" {

void* spu_create(const char* pieces, int64_t pieces_len, int32_t n_pieces,
                 const double* scores, double unk_score, int32_t unk_id,
                 const int32_t* byte_ids, int32_t has_bytes) {
  Model* m = new Model();
  m->scores.assign(scores, scores + n_pieces);
  m->unk_score = unk_score;
  m->unk_id = unk_id;
  m->has_bytes = has_bytes != 0;
  if (has_bytes) std::memcpy(m->byte_ids, byte_ids, 256 * sizeof(int32_t));
  // pieces: '\n'-separated, in id order
  int32_t pid = 0;
  const char* p = pieces;
  const char* end = pieces + pieces_len;
  while (p < end && pid < n_pieces) {
    const char* nl = (const char*)memchr(p, '\n', end - p);
    size_t n = nl ? (size_t)(nl - p) : (size_t)(end - p);
    if (n > 0) m->trie.insert(p, n, pid);
    ++pid;
    p = nl ? nl + 1 : end;
  }
  return m;
}

void spu_destroy(void* h) { delete (Model*)h; }

int64_t spu_encode(void* h, const char* text, int64_t n, int32_t* out,
                   int64_t out_cap) {
  const Model& m = *(Model*)h;
  if (n == 0) return 0;
  const double NEG = -1e18;
  std::vector<double> best_score(n + 1, NEG);
  std::vector<int64_t> best_prev(n + 1, -1);
  std::vector<int32_t> best_id(n + 1, 0);
  best_score[0] = 0.0;

  for (int64_t i = 0; i < n; ++i) {
    if (best_score[i] <= NEG) continue;
    // trie walk for all pieces starting at i
    int32_t node = 0;
    for (int64_t j = i; j < n; ++j) {
      node = m.trie.child(node, (uint8_t)text[j]);
      if (node < 0) break;
      int32_t pid = m.trie.piece_id[node];
      if (pid >= 0) {
        double s = best_score[i] + m.scores[pid];
        if (s > best_score[j + 1]) {
          best_score[j + 1] = s;
          best_prev[j + 1] = i;
          best_id[j + 1] = pid;
        }
      }
    }
    // unknown: one full UTF-8 character
    int64_t endc = i + utf8_len((uint8_t)text[i]);
    if (endc > n) endc = n;
    double s = best_score[i] + m.unk_score;
    if (s > best_score[endc]) {
      best_score[endc] = s;
      best_prev[endc] = i;
      best_id[endc] = -1;
    }
  }

  // backtrack
  std::vector<std::pair<int64_t, int32_t>> segs;  // (start, pid), end implied
  std::vector<int64_t> ends;
  int64_t pos = n;
  while (pos > 0) {
    int64_t prev = best_prev[pos];
    if (prev < 0) return -1;  // unreachable (shouldn't happen)
    segs.push_back({prev, best_id[pos]});
    ends.push_back(pos);
    pos = prev;
  }

  int64_t count = 0;
  // segs reversed: iterate from back
  for (int64_t k = (int64_t)segs.size() - 1; k >= 0;) {
    int64_t start = segs[k].first;
    int32_t pid = segs[k].second;
    int64_t endk = ends[k];
    if (pid != -1) {
      if (count >= out_cap) return -2;
      out[count++] = pid;
      --k;
      continue;
    }
    // fuse consecutive unknowns
    int64_t j = k;
    while (j >= 0 && segs[j].second == -1) {
      endk = ends[j];
      --j;
    }
    if (m.has_bytes) {
      for (int64_t b = start; b < endk; ++b) {
        if (count >= out_cap) return -2;
        out[count++] = m.byte_ids[(uint8_t)text[b]];
      }
    } else {
      if (count >= out_cap) return -2;
      out[count++] = m.unk_id;
    }
    k = j;
  }
  return count;
}

}  // extern "C"
