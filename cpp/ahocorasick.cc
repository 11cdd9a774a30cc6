// Aho-Corasick multi-pattern matcher — native engine for Path-B lexicon
// tagging over corpus text (the reference runs this in pure Python at
// app/services/policy_path_b.py:335-410 and a second copy at
// app/main.py:3355; this is the compiled replacement for bulk ingest).
//
// C API (ctypes-friendly):
//   ac_create()                       -> handle
//   ac_add_pattern(h, bytes, len, id) -> 0/err   (call before build)
//   ac_build(h)                       -> 0/err   (BFS failure links)
//   ac_match(h, text, len, word_boundary, out_ids, out_ends, max) -> n
//       matches reported as (pattern id, end offset); when
//       word_boundary != 0 a match is suppressed unless the bytes
//       adjacent to it are non-alphanumeric (matching the Python
//       matcher's (?<![a-z0-9])pat(?![a-z0-9]) semantics).
//   ac_match_set(h, text, len, wb, out_flags, n_patterns) -> n_distinct
//       presence-bitmap variant for tagging: out_flags[id] = 1.
//   ac_free(h)
//
// Build: make -C cpp   (g++ -O2 -shared -fPIC)
#include <cstdint>
#include <cstring>
#include <queue>
#include <vector>

namespace {

struct Node {
  int32_t next[256];
  int32_t fail = 0;
  std::vector<int32_t> out;  // pattern ids ending here
  std::vector<int32_t> lens; // their lengths (for boundary checks)
  Node() { memset(next, -1, sizeof(next)); }
};

struct AC {
  std::vector<Node> nodes;
  bool built = false;
  int32_t n_patterns = 0;
  AC() { nodes.emplace_back(); }
};

inline bool is_word(unsigned char c) {
  return (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
         (c >= '0' && c <= '9');
}

}  // namespace

extern "C" {

void* ac_create() { return new AC(); }

void ac_free(void* h) { delete static_cast<AC*>(h); }

int ac_add_pattern(void* h, const char* pat, int len, int id) {
  AC* ac = static_cast<AC*>(h);
  if (ac->built || len <= 0) return -1;
  int32_t cur = 0;
  for (int i = 0; i < len; ++i) {
    unsigned char c = static_cast<unsigned char>(pat[i]);
    if (ac->nodes[cur].next[c] < 0) {
      ac->nodes[cur].next[c] = static_cast<int32_t>(ac->nodes.size());
      ac->nodes.emplace_back();
    }
    cur = ac->nodes[cur].next[c];
  }
  ac->nodes[cur].out.push_back(id);
  ac->nodes[cur].lens.push_back(len);
  if (id + 1 > ac->n_patterns) ac->n_patterns = id + 1;
  return 0;
}

int ac_build(void* h) {
  AC* ac = static_cast<AC*>(h);
  if (ac->built) return -1;
  std::queue<int32_t> q;
  for (int c = 0; c < 256; ++c) {
    int32_t v = ac->nodes[0].next[c];
    if (v < 0) {
      ac->nodes[0].next[c] = 0;  // goto automaton: missing root edge loops
    } else {
      ac->nodes[v].fail = 0;
      q.push(v);
    }
  }
  while (!q.empty()) {
    int32_t u = q.front();
    q.pop();
    for (int c = 0; c < 256; ++c) {
      int32_t v = ac->nodes[u].next[c];
      int32_t f = ac->nodes[ac->nodes[u].fail].next[c];
      if (v < 0) {
        ac->nodes[u].next[c] = f;  // path compression
      } else {
        ac->nodes[v].fail = f;
        // merge output links so every match surfaces at the deepest node
        const Node& fn = ac->nodes[f];
        ac->nodes[v].out.insert(ac->nodes[v].out.end(), fn.out.begin(), fn.out.end());
        ac->nodes[v].lens.insert(ac->nodes[v].lens.end(), fn.lens.begin(), fn.lens.end());
        q.push(v);
      }
    }
  }
  ac->built = true;
  return 0;
}

int ac_match(void* h, const char* text, int len, int word_boundary,
             int32_t* out_ids, int32_t* out_ends, int max_out) {
  AC* ac = static_cast<AC*>(h);
  if (!ac->built) return -1;
  int n = 0;
  int32_t cur = 0;
  for (int i = 0; i < len; ++i) {
    cur = ac->nodes[cur].next[static_cast<unsigned char>(text[i])];
    const Node& node = ac->nodes[cur];
    for (size_t k = 0; k < node.out.size(); ++k) {
      int32_t plen = node.lens[k];
      int start = i - plen + 1;
      if (word_boundary) {
        if (start > 0 && is_word(text[start - 1])) continue;
        if (i + 1 < len && is_word(text[i + 1])) continue;
      }
      if (n < max_out) {
        out_ids[n] = node.out[k];
        out_ends[n] = i + 1;
      }
      ++n;  // keep counting so callers can resize and retry
    }
  }
  return n;
}

int ac_match_set(void* h, const char* text, int len, int word_boundary,
                 uint8_t* out_flags, int n_patterns) {
  AC* ac = static_cast<AC*>(h);
  if (!ac->built) return -1;
  memset(out_flags, 0, n_patterns);
  int distinct = 0;
  int32_t cur = 0;
  for (int i = 0; i < len; ++i) {
    cur = ac->nodes[cur].next[static_cast<unsigned char>(text[i])];
    const Node& node = ac->nodes[cur];
    for (size_t k = 0; k < node.out.size(); ++k) {
      int32_t id = node.out[k];
      if (id >= n_patterns || out_flags[id]) continue;
      int32_t plen = node.lens[k];
      int start = i - plen + 1;
      if (word_boundary) {
        if (start > 0 && is_word(text[start - 1])) continue;
        if (i + 1 < len && is_word(text[i + 1])) continue;
      }
      out_flags[id] = 1;
      ++distinct;
    }
  }
  return distinct;
}

int ac_num_patterns(void* h) { return static_cast<AC*>(h)->n_patterns; }

}  // extern "C"
