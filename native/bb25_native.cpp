// bb25_native: host-side hot loops for the TPU BM25 engine.
//
// Implements the tokenizer (lowercase + [a-z0-9]+ extraction + stopword
// filter + Porter stemmer) and the corpus builder (vocab construction +
// per-doc term counting) in C++. The Python reference implementation lives
// in bayesian_bm25_tpu/engine/tokenize.py; behavior here must match it
// exactly (parity-tested in tests/test_tokenize.py).
//
// C ABI (ctypes-friendly): results are heap-allocated structs of flat
// arrays; callers copy into numpy and free via the matching free function.

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

const std::unordered_set<std::string>& stopwords() {
  static const std::unordered_set<std::string> kStop = {
      "a",    "an",   "and",  "are",  "as",    "at",   "be",   "but",
      "by",   "for",  "if",   "in",   "into",  "is",   "it",   "no",
      "not",  "of",   "on",   "or",   "such",  "that", "the",  "their",
      "then", "there", "these", "they", "this", "to",   "was",  "will",
      "with"};
  return kStop;
}

inline bool is_word_char(char c) {
  return (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9');
}

// ----- Porter stemmer ------------------------------------------------------

bool is_consonant(const std::string& w, int i) {
  char c = w[i];
  if (c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u') return false;
  if (c == 'y') return i == 0 ? true : !is_consonant(w, i - 1);
  return true;
}

int measure(const std::string& stem) {
  int m = 0;
  bool prev_vowel = false;
  for (int i = 0; i < (int)stem.size(); ++i) {
    if (is_consonant(stem, i)) {
      if (prev_vowel) ++m;
      prev_vowel = false;
    } else {
      prev_vowel = true;
    }
  }
  return m;
}

bool contains_vowel(const std::string& stem) {
  for (int i = 0; i < (int)stem.size(); ++i)
    if (!is_consonant(stem, i)) return true;
  return false;
}

bool ends_double_consonant(const std::string& w) {
  int n = (int)w.size();
  return n >= 2 && w[n - 1] == w[n - 2] && is_consonant(w, n - 1);
}

bool ends_cvc(const std::string& w) {
  int n = (int)w.size();
  if (n < 3) return false;
  if (!(is_consonant(w, n - 3) && !is_consonant(w, n - 2) &&
        is_consonant(w, n - 1)))
    return false;
  char c = w[n - 1];
  return c != 'w' && c != 'x' && c != 'y';
}

bool ends_with(const std::string& w, const char* suf) {
  size_t n = std::strlen(suf);
  return w.size() >= n && w.compare(w.size() - n, n, suf) == 0;
}

std::string porter_stem(const std::string& word) {
  if (word.size() <= 2) return word;
  std::string w = word;

  // Step 1a
  if (ends_with(w, "sses")) {
    w.resize(w.size() - 2);
  } else if (ends_with(w, "ies")) {
    w.resize(w.size() - 2);
  } else if (ends_with(w, "ss")) {
    // keep
  } else if (ends_with(w, "s")) {
    w.resize(w.size() - 1);
  }

  // Step 1b
  if (ends_with(w, "eed")) {
    if (measure(w.substr(0, w.size() - 3)) > 0) w.resize(w.size() - 1);
  } else {
    bool flag = false;
    if (ends_with(w, "ed") && contains_vowel(w.substr(0, w.size() - 2))) {
      w.resize(w.size() - 2);
      flag = true;
    } else if (ends_with(w, "ing") &&
               contains_vowel(w.substr(0, w.size() - 3))) {
      w.resize(w.size() - 3);
      flag = true;
    }
    if (flag) {
      if (ends_with(w, "at") || ends_with(w, "bl") || ends_with(w, "iz")) {
        w += 'e';
      } else if (ends_double_consonant(w) && !ends_with(w, "l") &&
                 !ends_with(w, "s") && !ends_with(w, "z")) {
        w.resize(w.size() - 1);
      } else if (measure(w) == 1 && ends_cvc(w)) {
        w += 'e';
      }
    }
  }

  // Step 1c
  if (ends_with(w, "y") && contains_vowel(w.substr(0, w.size() - 1))) {
    w[w.size() - 1] = 'i';
  }

  // Step 2
  static const std::pair<const char*, const char*> kStep2[] = {
      {"ational", "ate"}, {"tional", "tion"}, {"enci", "ence"},
      {"anci", "ance"},   {"izer", "ize"},    {"abli", "able"},
      {"alli", "al"},     {"entli", "ent"},   {"eli", "e"},
      {"ousli", "ous"},   {"ization", "ize"}, {"ation", "ate"},
      {"ator", "ate"},    {"alism", "al"},    {"iveness", "ive"},
      {"fulness", "ful"}, {"ousness", "ous"}, {"aliti", "al"},
      {"iviti", "ive"},   {"biliti", "ble"}};
  for (const auto& [suf, rep] : kStep2) {
    if (ends_with(w, suf)) {
      std::string stem = w.substr(0, w.size() - std::strlen(suf));
      if (measure(stem) > 0) w = stem + rep;
      break;
    }
  }

  // Step 3
  static const std::pair<const char*, const char*> kStep3[] = {
      {"icate", "ic"}, {"ative", ""},  {"alize", "al"}, {"iciti", "ic"},
      {"ical", "ic"},  {"ful", ""},    {"ness", ""}};
  for (const auto& [suf, rep] : kStep3) {
    if (ends_with(w, suf)) {
      std::string stem = w.substr(0, w.size() - std::strlen(suf));
      if (measure(stem) > 0) w = stem + rep;
      break;
    }
  }

  // Step 4
  static const char* kStep4[] = {"al",   "ance", "ence", "er",    "ic",
                                 "able", "ible", "ant",  "ement", "ment",
                                 "ent",  "ou",   "ism",  "ate",   "iti",
                                 "ous",  "ive",  "ize"};
  bool matched4 = false;
  for (const char* suf : kStep4) {
    if (ends_with(w, suf)) {
      std::string stem = w.substr(0, w.size() - std::strlen(suf));
      if (measure(stem) > 1) w = stem;
      matched4 = true;
      break;
    }
  }
  if (!matched4 && ends_with(w, "ion") && w.size() > 3) {
    char c = w[w.size() - 4];
    if ((c == 's' || c == 't') && measure(w.substr(0, w.size() - 3)) > 1) {
      w.resize(w.size() - 3);
    }
  }

  // Step 5a
  if (ends_with(w, "e")) {
    std::string stem = w.substr(0, w.size() - 1);
    int m = measure(stem);
    if (m > 1 || (m == 1 && !ends_cvc(stem))) w = stem;
  }

  // Step 5b
  if (measure(w) > 1 && ends_double_consonant(w) && ends_with(w, "l")) {
    w.resize(w.size() - 1);
  }

  return w;
}

void tokenize_one(const char* begin, const char* end, bool lowercase,
                  bool remove_stop, bool stem,
                  std::vector<std::string>* out) {
  std::string cur;
  for (const char* p = begin; p <= end; ++p) {
    char c = (p < end) ? *p : ' ';
    if (lowercase && c >= 'A' && c <= 'Z') c = (char)(c - 'A' + 'a');
    if (is_word_char(c)) {
      cur += c;
    } else if (!cur.empty()) {
      if (!remove_stop || !stopwords().count(cur)) {
        out->push_back(stem ? porter_stem(cur) : cur);
      }
      cur.clear();
    }
  }
}

}  // namespace

extern "C" {

// ----- Batch tokenization (strings out) ------------------------------------

struct TokenizeResult {
  char* token_blob;        // concatenated token bytes
  int64_t* token_offsets;  // n_tokens + 1 into token_blob
  int64_t* doc_offsets;    // n_docs + 1 into token index space
  int64_t n_tokens;
  int64_t blob_size;
};

TokenizeResult* bb25_tokenize(const char* blob, const int64_t* offsets,
                              int64_t n_docs, int lowercase, int remove_stop,
                              int stem) {
  auto* res = new TokenizeResult();
  std::string token_blob;
  std::vector<int64_t> token_offsets{0};
  std::vector<int64_t> doc_offsets{0};
  std::vector<std::string> tokens;
  for (int64_t d = 0; d < n_docs; ++d) {
    tokens.clear();
    tokenize_one(blob + offsets[d], blob + offsets[d + 1], lowercase != 0,
                 remove_stop != 0, stem != 0, &tokens);
    for (const auto& t : tokens) {
      token_blob += t;
      token_offsets.push_back((int64_t)token_blob.size());
    }
    doc_offsets.push_back((int64_t)token_offsets.size() - 1);
  }
  res->n_tokens = (int64_t)token_offsets.size() - 1;
  res->blob_size = (int64_t)token_blob.size();
  res->token_blob = new char[token_blob.size() + 1];
  std::memcpy(res->token_blob, token_blob.data(), token_blob.size());
  res->token_blob[token_blob.size()] = 0;
  res->token_offsets = new int64_t[token_offsets.size()];
  std::memcpy(res->token_offsets, token_offsets.data(),
              token_offsets.size() * sizeof(int64_t));
  res->doc_offsets = new int64_t[doc_offsets.size()];
  std::memcpy(res->doc_offsets, doc_offsets.data(),
              doc_offsets.size() * sizeof(int64_t));
  return res;
}

void bb25_free_tokenize(TokenizeResult* res) {
  if (!res) return;
  delete[] res->token_blob;
  delete[] res->token_offsets;
  delete[] res->doc_offsets;
  delete res;
}

// ----- Corpus build: tokenize + vocab + per-doc term counts ----------------

struct CorpusResult {
  int64_t* doc_indptr;   // n_docs + 1 into term_ids/term_counts
  int32_t* term_ids;     // nnz (unique terms per doc)
  int32_t* term_counts;  // nnz
  int32_t* doc_lengths;  // n_docs (total token count incl. duplicates)
  char* vocab_blob;      // concatenated vocab strings (id order)
  int64_t* vocab_offsets;  // n_vocab + 1
  int64_t n_vocab;
  int64_t nnz;
  int64_t vocab_blob_size;
};

CorpusResult* bb25_build_corpus(const char* blob, const int64_t* offsets,
                                int64_t n_docs, int lowercase,
                                int remove_stop, int stem) {
  auto* res = new CorpusResult();
  std::unordered_map<std::string, int32_t> vocab;
  std::vector<std::string> vocab_order;
  std::vector<int64_t> indptr{0};
  std::vector<int32_t> term_ids;
  std::vector<int32_t> term_counts;
  std::vector<int32_t> doc_lengths;

  std::vector<std::string> tokens;
  std::unordered_map<int32_t, int32_t> counts;
  for (int64_t d = 0; d < n_docs; ++d) {
    tokens.clear();
    counts.clear();
    tokenize_one(blob + offsets[d], blob + offsets[d + 1], lowercase != 0,
                 remove_stop != 0, stem != 0, &tokens);
    doc_lengths.push_back((int32_t)tokens.size());
    for (const auto& t : tokens) {
      auto it = vocab.find(t);
      int32_t id;
      if (it == vocab.end()) {
        id = (int32_t)vocab_order.size();
        vocab.emplace(t, id);
        vocab_order.push_back(t);
      } else {
        id = it->second;
      }
      ++counts[id];
    }
    // Preserve first-occurrence order within the doc for determinism.
    std::unordered_set<int32_t> seen;
    for (const auto& t : tokens) {
      int32_t id = vocab[t];
      if (seen.insert(id).second) {
        term_ids.push_back(id);
        term_counts.push_back(counts[id]);
      }
    }
    indptr.push_back((int64_t)term_ids.size());
  }

  std::string vocab_blob;
  std::vector<int64_t> vocab_offsets{0};
  for (const auto& t : vocab_order) {
    vocab_blob += t;
    vocab_offsets.push_back((int64_t)vocab_blob.size());
  }

  res->n_vocab = (int64_t)vocab_order.size();
  res->nnz = (int64_t)term_ids.size();
  res->vocab_blob_size = (int64_t)vocab_blob.size();
  res->doc_indptr = new int64_t[indptr.size()];
  std::memcpy(res->doc_indptr, indptr.data(), indptr.size() * sizeof(int64_t));
  res->term_ids = new int32_t[term_ids.size() + 1];
  std::memcpy(res->term_ids, term_ids.data(),
              term_ids.size() * sizeof(int32_t));
  res->term_counts = new int32_t[term_counts.size() + 1];
  std::memcpy(res->term_counts, term_counts.data(),
              term_counts.size() * sizeof(int32_t));
  res->doc_lengths = new int32_t[doc_lengths.size() + 1];
  std::memcpy(res->doc_lengths, doc_lengths.data(),
              doc_lengths.size() * sizeof(int32_t));
  res->vocab_blob = new char[vocab_blob.size() + 1];
  std::memcpy(res->vocab_blob, vocab_blob.data(), vocab_blob.size());
  res->vocab_blob[vocab_blob.size()] = 0;
  res->vocab_offsets = new int64_t[vocab_offsets.size()];
  std::memcpy(res->vocab_offsets, vocab_offsets.data(),
              vocab_offsets.size() * sizeof(int64_t));
  return res;
}

void bb25_free_corpus(CorpusResult* res) {
  if (!res) return;
  delete[] res->doc_indptr;
  delete[] res->term_ids;
  delete[] res->term_counts;
  delete[] res->doc_lengths;
  delete[] res->vocab_blob;
  delete[] res->vocab_offsets;
  delete res;
}

}  // extern "C"
