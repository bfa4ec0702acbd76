// Native WordPiece tokenizer.
//
// Capability parity: the reference depends on HuggingFace `tokenizers` (Rust)
// for its fast tokenizers (reference requirements.txt: tokenizers==0.9.4,
// easynlp/modelzoo/tokenization_utils_fast.py). This C++ implementation
// covers the BERT pipeline's hot path — UTF-8 aware basic tokenization
// (cleanup, CJK isolation, punctuation split, ASCII lowercase) + greedy
// longest-match WordPiece over a hash-map vocab — exposed through a C ABI
// consumed via ctypes (easynlp_tpu/data/fast_tokenizer.py). Unicode accent
// stripping (rare path) is pre-applied by the Python wrapper so outputs are
// byte-identical with the pure-Python reference implementation.
//
// Build: g++ -O3 -std=c++17 -shared -fPIC -o libwordpiece.so wordpiece_tokenizer.cpp

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Tokenizer {
    std::unordered_map<std::string, int32_t> vocab;
    int32_t unk_id = 0;
    bool do_lower_case = true;
    int32_t max_chars_per_word = 100;
    // Optional per-codepoint class table supplied by the Python wrapper
    // (built from unicodedata so whitespace/control/punct match the
    // pure-Python pipeline exactly). Bit flags below.
    std::vector<uint8_t> classes;
};

constexpr uint8_t kClassWhitespace = 1;
constexpr uint8_t kClassControl = 2;
constexpr uint8_t kClassPunct = 4;

// --- UTF-8 ------------------------------------------------------------------

inline int utf8_len(unsigned char c) {
    if (c < 0x80) return 1;
    if ((c >> 5) == 0x6) return 2;
    if ((c >> 4) == 0xE) return 3;
    if ((c >> 3) == 0x1E) return 4;
    return 1;  // invalid byte: treat as single char
}

inline uint32_t utf8_decode(const char* s, int len) {
    const unsigned char* u = reinterpret_cast<const unsigned char*>(s);
    switch (len) {
        case 1: return u[0];
        case 2: return ((u[0] & 0x1F) << 6) | (u[1] & 0x3F);
        case 3: return ((u[0] & 0x0F) << 12) | ((u[1] & 0x3F) << 6)
                       | (u[2] & 0x3F);
        default: return ((u[0] & 0x07) << 18) | ((u[1] & 0x3F) << 12)
                        | ((u[2] & 0x3F) << 6) | (u[3] & 0x3F);
    }
}

// --- character classes (mirror tokenization_utils.py) ------------------------

inline bool is_whitespace(uint32_t cp) {
    return cp == ' ' || cp == '\t' || cp == '\n' || cp == '\r'
        || cp == 0x00A0 || cp == 0x2000 || (cp >= 0x2000 && cp <= 0x200A)
        || cp == 0x202F || cp == 0x205F || cp == 0x3000 || cp == 0x1680;
}

inline bool is_control(uint32_t cp) {
    if (cp == '\t' || cp == '\n' || cp == '\r') return false;
    return cp < 0x20 || cp == 0x7F || (cp >= 0x80 && cp <= 0x9F)
        || cp == 0x200B || cp == 0x200C || cp == 0x200D || cp == 0xFEFF
        || (cp >= 0x202A && cp <= 0x202E);
}

inline bool is_cjk(uint32_t cp) {
    return (cp >= 0x4E00 && cp <= 0x9FFF) || (cp >= 0x3400 && cp <= 0x4DBF)
        || (cp >= 0x20000 && cp <= 0x2A6DF) || (cp >= 0x2A700 && cp <= 0x2B73F)
        || (cp >= 0x2B740 && cp <= 0x2B81F) || (cp >= 0x2B820 && cp <= 0x2CEAF)
        || (cp >= 0xF900 && cp <= 0xFAFF) || (cp >= 0x2F800 && cp <= 0x2FA1F);
}

inline bool is_punct(uint32_t cp) {
    // ASCII punct ranges (reference _is_punctuation) + common unicode punct
    if ((cp >= 33 && cp <= 47) || (cp >= 58 && cp <= 64)
        || (cp >= 91 && cp <= 96) || (cp >= 123 && cp <= 126)) return true;
    return (cp >= 0x2000 && cp <= 0x206F)   // general punctuation
        || (cp >= 0x3000 && cp <= 0x303F && !is_whitespace(cp))  // CJK punct
        || (cp >= 0xFF00 && cp <= 0xFF0F) || (cp >= 0xFF1A && cp <= 0xFF20)
        || (cp >= 0xFF3B && cp <= 0xFF40) || (cp >= 0xFF5B && cp <= 0xFF65)
        || cp == 0x00B7 || cp == 0x00AB || cp == 0x00BB
        || (cp >= 0x2018 && cp <= 0x201F);
}

// --- pipeline -----------------------------------------------------------------

void basic_tokenize(const Tokenizer& tok, const std::string& text,
                    std::vector<std::string>* words) {
    std::string current;
    size_t i = 0;
    const bool have_table = !tok.classes.empty();
    const size_t table_n = tok.classes.size();
    auto cls_ws = [&](uint32_t cp) {
        return (have_table && cp < table_n)
            ? (tok.classes[cp] & kClassWhitespace) != 0 : is_whitespace(cp);
    };
    auto cls_ctrl = [&](uint32_t cp) {
        return (have_table && cp < table_n)
            ? (tok.classes[cp] & kClassControl) != 0 : is_control(cp);
    };
    auto cls_punct = [&](uint32_t cp) {
        return (have_table && cp < table_n)
            ? (tok.classes[cp] & kClassPunct) != 0 : is_punct(cp);
    };
    auto flush = [&]() {
        if (!current.empty()) {
            words->push_back(current);
            current.clear();
        }
    };
    while (i < text.size()) {
        int len = utf8_len(static_cast<unsigned char>(text[i]));
        if (i + len > text.size()) len = 1;
        uint32_t cp = utf8_decode(text.data() + i, len);
        if (cp == 0 || cp == 0xFFFD || cls_ctrl(cp)) {
            i += len;
            continue;
        }
        if (cls_ws(cp)) {
            flush();
        } else if (is_cjk(cp) || cls_punct(cp)) {
            flush();
            words->emplace_back(text.substr(i, len));
        } else {
            if (tok.do_lower_case && cp >= 'A' && cp <= 'Z') {
                current.push_back(static_cast<char>(cp - 'A' + 'a'));
            } else {
                current.append(text, i, len);
            }
        }
        i += len;
    }
    flush();
}

void wordpiece(const Tokenizer& tok, const std::string& word,
               std::vector<int32_t>* ids) {
    // count codepoints
    int n_chars = 0;
    std::vector<size_t> offsets;  // byte offset of each codepoint + end
    for (size_t i = 0; i < word.size();) {
        offsets.push_back(i);
        i += utf8_len(static_cast<unsigned char>(word[i]));
        ++n_chars;
    }
    offsets.push_back(word.size());
    if (n_chars > tok.max_chars_per_word) {
        ids->push_back(tok.unk_id);
        return;
    }
    std::vector<int32_t> pieces;
    int start = 0;
    while (start < n_chars) {
        int end = n_chars;
        int32_t cur = -1;
        while (start < end) {
            std::string sub = word.substr(offsets[start],
                                          offsets[end] - offsets[start]);
            if (start > 0) sub = "##" + sub;
            auto it = tok.vocab.find(sub);
            if (it != tok.vocab.end()) {
                cur = it->second;
                break;
            }
            --end;
        }
        if (cur < 0) {
            ids->push_back(tok.unk_id);
            return;
        }
        pieces.push_back(cur);
        start = end;
    }
    ids->insert(ids->end(), pieces.begin(), pieces.end());
}

}  // namespace

extern "C" {

void* wp_create(const char* vocab_data, int64_t n_bytes, int do_lower_case,
                const char* unk_token) {
    auto* tok = new Tokenizer();
    tok->do_lower_case = do_lower_case != 0;
    std::string data(vocab_data, static_cast<size_t>(n_bytes));
    size_t pos = 0;
    int32_t idx = 0;
    while (pos < data.size()) {
        size_t nl = data.find('\n', pos);
        if (nl == std::string::npos) nl = data.size();
        std::string token = data.substr(pos, nl - pos);
        if (!token.empty() && token.back() == '\r') token.pop_back();
        tok->vocab[token] = idx++;
        pos = nl + 1;
    }
    auto it = tok->vocab.find(unk_token);
    tok->unk_id = (it != tok->vocab.end()) ? it->second : 0;
    return tok;
}

void wp_destroy(void* handle) {
    delete static_cast<Tokenizer*>(handle);
}

// Install a per-codepoint class table (flags: 1=whitespace, 2=control,
// 4=punct) covering codepoints [0, n). Codepoints >= n use the built-in
// range heuristics.
void wp_set_classes(void* handle, const uint8_t* data, int64_t n) {
    auto* tok = static_cast<Tokenizer*>(handle);
    tok->classes.assign(data, data + n);
}

// Tokenize one string → token ids. Returns count written (<= max_ids).
int64_t wp_encode(void* handle, const char* text, int64_t n_bytes,
                  int32_t* out_ids, int64_t max_ids) {
    const auto& tok = *static_cast<Tokenizer*>(handle);
    std::vector<std::string> words;
    basic_tokenize(tok, std::string(text, static_cast<size_t>(n_bytes)),
                   &words);
    std::vector<int32_t> ids;
    ids.reserve(64);
    for (const auto& w : words) wordpiece(tok, w, &ids);
    int64_t n = static_cast<int64_t>(ids.size());
    if (n > max_ids) n = max_ids;
    std::memcpy(out_ids, ids.data(), n * sizeof(int32_t));
    return n;
}

}  // extern "C"
