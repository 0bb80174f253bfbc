// Host-side native components for hyperdb_tpu.
//
// Plays the role the reference delegates to native pip dependencies
// (HF Rust tokenizers for chunking, NumPy C loops for host-side filtering —
// SURVEY.md §2.3). Exposed through a minimal C ABI consumed via ctypes
// (hyperdb_tpu/native/tokenizer.py).
//
// Build: make -C hyperdb_tpu/native

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <string>

namespace {

inline bool is_space(unsigned char c) {
  return c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' ||
         c == '\v';
}

}  // namespace

extern "C" {

// Tokenize UTF-8 text into whitespace-delimited words. Returns a single
// malloc'd buffer of '\n'-joined tokens; *out_len receives its byte length.
// Caller frees with hdb_free. Matches hyperdb_tpu.core.chunker.WordTokenizer.
char* hdb_tokenize_words(const char* text, size_t len, size_t* out_len) {
  std::string out;
  out.reserve(len);
  size_t i = 0;
  bool first = true;
  while (i < len) {
    while (i < len && is_space(static_cast<unsigned char>(text[i]))) ++i;
    size_t start = i;
    while (i < len && !is_space(static_cast<unsigned char>(text[i]))) ++i;
    if (i > start) {
      if (!first) out.push_back('\n');
      out.append(text + start, i - start);
      first = false;
    }
  }
  *out_len = out.size();
  char* buf = static_cast<char*>(std::malloc(out.size() + 1));
  if (buf == nullptr) {
    *out_len = 0;
    return nullptr;
  }
  std::memcpy(buf, out.data(), out.size());
  buf[out.size()] = '\0';
  return buf;
}

// Lowercase + strip punctuation + tokenize: the sentence-filter tokenizer
// (reference hyperdb.py:1136-1141) for the host-side filter hot loop.
// ASCII-only contract: the Python binding routes any input containing a
// byte >= 0x80 to the Unicode-aware Python tokenizer (byte-level code can't
// lowercase 'É' or classify Unicode word characters correctly).
char* hdb_tokenize_filter(const char* text, size_t len, size_t* out_len) {
  std::string out;
  out.reserve(len);
  bool in_word = false;
  for (size_t i = 0; i < len; ++i) {
    unsigned char c = static_cast<unsigned char>(text[i]);
    bool word_char = (c >= '0' && c <= '9') || (c >= 'a' && c <= 'z') ||
                     (c >= 'A' && c <= 'Z') || c == '_' || c >= 0x80;
    bool punct = !word_char && c > ' ' && c < 0x80;
    if (word_char) {
      if (!in_word && !out.empty()) out.push_back('\n');
      out.push_back((c >= 'A' && c <= 'Z') ? static_cast<char>(c + 32)
                                           : static_cast<char>(c));
      in_word = true;
    } else if (punct) {
      // ASCII punctuation is *removed*, not a word boundary — parity with
      // the reference's translate-then-\w+ tokenizer ("don't" -> "dont").
    } else {
      in_word = false;
    }
  }
  *out_len = out.size();
  char* buf = static_cast<char*>(std::malloc(out.size() + 1));
  if (buf == nullptr) {
    *out_len = 0;
    return nullptr;
  }
  std::memcpy(buf, out.data(), out.size());
  buf[out.size()] = '\0';
  return buf;
}

// Merge per-shard top-k results into global top-k (host-side fallback merge
// for multi-host deployments where the final merge happens off-device).
// scores: (n_shards * k) f32, ids: (n_shards * k) i64; outputs the k best
// into out_scores/out_ids (descending). Exact, stable on ties by lower id.
void hdb_merge_topk(const float* scores, const int64_t* ids, size_t total,
                    size_t k, float* out_scores, int64_t* out_ids) {
  // selection into a small heap-free insertion buffer (k is small)
  for (size_t j = 0; j < k; ++j) {
    out_scores[j] = -__builtin_inff();
    out_ids[j] = -1;
  }
  for (size_t i = 0; i < total; ++i) {
    float sc = scores[i];
    int64_t id = ids[i];
    size_t pos = k;
    while (pos > 0 &&
           (sc > out_scores[pos - 1] ||
            (sc == out_scores[pos - 1] && id < out_ids[pos - 1]))) {
      --pos;
    }
    if (pos < k) {
      for (size_t shift = k - 1; shift > pos; --shift) {
        out_scores[shift] = out_scores[shift - 1];
        out_ids[shift] = out_ids[shift - 1];
      }
      out_scores[pos] = sc;
      out_ids[pos] = id;
    }
  }
}

void hdb_free(void* ptr) { std::free(ptr); }

}  // extern "C"
