// Native context beam search (CBS) + ARPA n-gram LM — C ABI for ctypes.
//
// Host-side counterpart of decode/beam_host.py (itself transcription-
// equivalent to the reference decoder, ctc_codec.py:124-307): prefix beam
// search over CTC posteriors with Katz-backoff n-gram scoring
// (kenlm.Model.score semantics, log10, bos=<s>, eos optional — matching
// lm/arpa.py). The Python host decoder is the correctness oracle
// (tests/test_native_cbs.py); this implementation exists because the CPU
// serving path (the reference's OpenVINO deployment mode) runs the beam
// search per line on the host, where the Python loop is the bottleneck.
//
// Everything works in integer id spaces: codec class ids (blank 0, chars
// 1..N, unknown N+1) for the search, ARPA word ids for the LM. The caller
// provides codec->word mapping built from the vocabulary (OOV chars map to
// <unk>, as lm/arpa.py's _known()).
//
// Build: make libcbsdecoder.so   (see Makefile)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <limits>
#include <memory>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

constexpr double kNegInf = -std::numeric_limits<double>::infinity();

double log_add(double a, double b) {
  if (a == kNegInf) return b;
  if (b == kNegInf) return a;
  double m = std::max(a, b);
  return m + std::log1p(std::exp(std::min(a, b) - m));
}

// n-gram key: raw little-endian int32 concatenation.
std::string PackKey(const int32_t* ids, int n) {
  return std::string(reinterpret_cast<const char*>(ids),
                     static_cast<size_t>(n) * sizeof(int32_t));
}

// ---------------------------------------------------------------- ArpaLM
class ArpaLM {
 public:
  bool Load(const std::string& path) {
    std::ifstream f(path);
    if (!f.is_open()) return false;
    std::string line;
    int section = 0;
    while (std::getline(f, line)) {
      // strip trailing \r and surrounding whitespace
      while (!line.empty() && (line.back() == '\r' || line.back() == '\n' ||
                               line.back() == ' ' || line.back() == '\t'))
        line.pop_back();
      size_t start = line.find_first_not_of(" \t");
      if (start == std::string::npos) continue;
      if (start) line = line.substr(start);
      if (line == "\\end\\") break;
      if (line.size() > 7 && line.front() == '\\' &&
          line.compare(line.size() - 7, 7, "-grams:") == 0) {
        section = std::atoi(line.c_str() + 1);
        order_ = std::max(order_, section);
        continue;
      }
      if (section == 0) continue;
      std::istringstream ss(line);
      std::vector<std::string> parts;
      std::string tok;
      while (ss >> tok) parts.push_back(tok);
      if (static_cast<int>(parts.size()) < section + 1) continue;
      double logp = std::atof(parts[0].c_str());
      std::vector<int32_t> ids(section);
      for (int i = 0; i < section; ++i) ids[i] = Intern(parts[1 + i]);
      std::string key = PackKey(ids.data(), section);
      probs_[key] = logp;
      if (static_cast<int>(parts.size()) > section + 1)
        backoffs_[key] = std::atof(parts[1 + section].c_str());
    }
    if (order_ == 0) return false;
    unk_id_ = WordId("<unk>");
    bos_id_ = WordId("<s>");
    eos_id_ = WordId("</s>");
    return unk_id_ >= 0;
  }

  int order() const { return order_; }
  int unk_id() const { return unk_id_; }
  int bos_id() const { return bos_id_; }
  int eos_id() const { return eos_id_; }

  // id of a word that HAS a unigram entry; -1 otherwise (callers map to
  // <unk>, mirroring lm/arpa.py::_known)
  int KnownWordId(const std::string& w) const {
    auto it = vocab_.find(w);
    if (it == vocab_.end()) return -1;
    int32_t id = it->second;
    return probs_.count(PackKey(&id, 1)) ? id : -1;
  }

  // log10 p(word | context) with Katz backoff; context already capped to
  // order-1 and vocabulary-mapped (lm/arpa.py::logprob).
  double LogProb(const int32_t* ctx, int n, int32_t word) const {
    double backoff_acc = 0.0;
    std::vector<int32_t> ng;
    while (true) {
      ng.assign(ctx, ctx + n);
      ng.push_back(word);
      auto it = probs_.find(PackKey(ng.data(), n + 1));
      if (it != probs_.end()) return it->second + backoff_acc;
      if (n == 0) {
        int32_t u = unk_id_;
        auto uit = probs_.find(PackKey(&u, 1));
        return (uit != probs_.end() ? uit->second : 0.0) + backoff_acc;
      }
      auto bit = backoffs_.find(PackKey(ctx, n));
      backoff_acc += (bit != backoffs_.end() ? bit->second : 0.0);
      ctx += 1;
      n -= 1;
    }
  }

  // kenlm.Model.score on a word-id sequence (bos always on, as the
  // decoder uses it; eos optional).
  double Score(const int32_t* words, int n, bool eos) const {
    std::vector<int32_t> ctx;
    ctx.push_back(bos_id_);
    double total = 0.0;
    auto step = [&](int32_t w) {
      int take = std::min<int>(order_ - 1, static_cast<int>(ctx.size()));
      total += LogProb(ctx.data() + ctx.size() - take, take, w);
      ctx.push_back(w);
    };
    for (int i = 0; i < n; ++i) step(words[i]);
    if (eos) step(eos_id_);
    return total;
  }

 private:
  int32_t Intern(const std::string& w) {
    auto it = vocab_.find(w);
    if (it != vocab_.end()) return it->second;
    int32_t id = static_cast<int32_t>(vocab_.size());
    vocab_.emplace(w, id);
    return id;
  }
  int WordId(const std::string& w) const {
    auto it = vocab_.find(w);
    return it == vocab_.end() ? -1 : it->second;
  }

  std::unordered_map<std::string, int32_t> vocab_;
  std::unordered_map<std::string, double> probs_;
  std::unordered_map<std::string, double> backoffs_;
  int order_ = 0;
  int unk_id_ = -1, bos_id_ = -1, eos_id_ = -1;
};

// ---------------------------------------------------------------- decoder
struct Beam {
  std::vector<int32_t> prefix;  // codec ids
  double pb = 0.0;
  double pnb = kNegInf;
  double pt = 0.0;
  double lm = 0.0;              // cumulative log10 P(prefix) (incremental)
  double prob() const { return log_add(pb, pnb); }
  double total() const { return prob() + pt; }
};

struct Decoder {
  const ArpaLM* lm = nullptr;            // may be null (no LM scoring)
  std::vector<int32_t> codec2word;       // codec id -> ARPA word id
  int unknown_id = 0;
  int beam_size = 10;
  int search_depth = 10;
  double lm_panelty = 2.0;
  double len_bonus = 5.8;
  bool use_lm_score = true;
  bool skip_search = false;
  double prune = std::log(0.001);
  int suffix_len = 4;

  // scratch
  std::vector<double> logp_row;

  // context = last (order-1) ids of <s> + prefix, vocabulary-mapped
  void Context(const Beam& b, std::vector<int32_t>* ctx) const {
    ctx->clear();
    int need = lm->order() - 1;
    int take = std::min<int>(need, static_cast<int>(b.prefix.size()));
    if (take < need && static_cast<int>(b.prefix.size()) == take)
      ctx->push_back(lm->bos_id());
    for (int i = static_cast<int>(b.prefix.size()) - take;
         i < static_cast<int>(b.prefix.size()); ++i)
      ctx->push_back(codec2word[b.prefix[i]]);
  }

  double SuffixScore(const Beam& b, const std::vector<int32_t>& suffix_w)
      const {
    if (!lm) return 0.0;
    std::vector<int32_t> ctx;
    Context(b, &ctx);
    double total = 0.0;
    for (int32_t w : suffix_w) {
      int take = std::min<int>(lm->order() - 1,
                               static_cast<int>(ctx.size()));
      total += lm->LogProb(ctx.data() + ctx.size() - take, take, w);
      ctx.push_back(w);
    }
    return total;
  }

  double ExtendLm(const Beam& parent, int32_t codec_id) const {
    if (!lm) return 0.0;
    std::vector<int32_t> ctx;
    Context(parent, &ctx);
    return parent.lm + lm->LogProb(
        ctx.data(), static_cast<int>(ctx.size()), codec2word[codec_id]);
  }

  void SearchStep(std::vector<Beam>* beams,
                  const std::vector<int>& cands,
                  const float* logp, const std::vector<int32_t>& suffix_w) {
    std::vector<Beam> gen;
    std::unordered_map<std::string, size_t> index;
    auto bucket = [&](const std::vector<int32_t>& prefix) -> Beam* {
      std::string key =
          PackKey(prefix.data(), static_cast<int>(prefix.size()));
      auto it = index.find(key);
      if (it != index.end()) return &gen[it->second];
      gen.emplace_back();
      Beam* nb = &gen.back();
      nb->prefix = prefix;
      nb->pb = kNegInf;
      nb->pnb = kNegInf;
      nb->lm = std::numeric_limits<double>::quiet_NaN();  // fill on touch
      index.emplace(std::move(key), gen.size() - 1);
      return nb;
    };

    std::vector<int32_t> scratch;
    for (const Beam& beam : *beams) {
      for (int idx : cands) {
        if (idx >= unknown_id) continue;
        double p = logp[idx];
        if (idx == 0) {
          Beam* g = bucket(beam.prefix);
          if (std::isnan(g->lm)) g->lm = beam.lm;
          g->pb = log_add(g->pb, beam.prob() + p);
          continue;
        }
        int32_t tail = beam.prefix.empty() ? -1 : beam.prefix.back();
        scratch = beam.prefix;
        scratch.push_back(idx);
        Beam* gnew = bucket(scratch);
        if (std::isnan(gnew->lm)) gnew->lm = ExtendLm(beam, idx);
        if (idx != tail) {
          gnew->pnb = log_add(gnew->pnb, beam.prob() + p);
        } else {
          gnew->pnb = log_add(gnew->pnb, beam.pb + p);
          Beam* gold = bucket(beam.prefix);
          if (std::isnan(gold->lm)) gold->lm = beam.lm;
          gold->pnb = log_add(gold->pnb, beam.pnb + p);
        }
      }
    }

    for (Beam& b : gen) {
      if (use_lm_score && lm) {
        b.pt = (b.lm + SuffixScore(b, suffix_w)) * lm_panelty +
               static_cast<double>(b.prefix.size()) * len_bonus;
      } else {
        b.pt = static_cast<double>(b.prefix.size()) * len_bonus;
      }
    }
    std::stable_sort(gen.begin(), gen.end(),
                     [](const Beam& a, const Beam& b) {
                       return a.total() > b.total();
                     });
    if (static_cast<int>(gen.size()) > beam_size) gen.resize(beam_size);
    beams->swap(gen);
  }

  int Decode(const float* preds, int T, int D, bool already_log,
             int32_t* out, int out_cap) {
    std::vector<float> logbuf;
    const float* lp = preds;
    if (!already_log) {
      logbuf.resize(static_cast<size_t>(T) * D);
      for (int t = 0; t < T; ++t) {
        const float* row = preds + static_cast<size_t>(t) * D;
        float m = row[0];
        for (int d = 1; d < D; ++d) m = std::max(m, row[d]);
        double z = 0.0;
        for (int d = 0; d < D; ++d) z += std::exp(double(row[d]) - m);
        float lz = m + static_cast<float>(std::log(z));
        float* dst = logbuf.data() + static_cast<size_t>(t) * D;
        for (int d = 0; d < D; ++d) dst[d] = row[d] - lz;
      }
      lp = logbuf.data();
    }

    // greedy top line: collapsed argmax (char, t)
    std::vector<int> argmax(T);
    for (int t = 0; t < T; ++t) {
      const float* row = lp + static_cast<size_t>(t) * D;
      int best = 0;
      for (int d = 1; d < D; ++d)
        if (row[d] > row[best]) best = d;
      argmax[t] = best;
    }
    std::vector<std::pair<int32_t, int>> top_line;  // (codec id, t)
    for (int t = 0; t < T; ++t) {
      int i = argmax[t];
      if (i != 0 && i != unknown_id && !(t > 0 && argmax[t - 1] == i))
        top_line.emplace_back(i, t);
    }
    int end = top_line.empty()
                  ? 0
                  : std::min(top_line.back().second + suffix_len, T);

    auto suffix_after = [&](int t, std::vector<int32_t>* w) {
      w->clear();
      for (const auto& ct : top_line) {
        if (ct.second > t) {
          w->push_back(lm ? codec2word[ct.first] : ct.first);
          if (static_cast<int>(w->size()) >= suffix_len) break;
        }
      }
    };

    std::vector<Beam> beams(1);
    std::vector<int> cands;
    std::vector<int32_t> suffix_w;
    for (int t = 0; t < end; ++t) {
      const float* row = lp + static_cast<size_t>(t) * D;
      if (skip_search) {
        // survivors above the prune threshold (`ctc_codec.py:128,144`)
        cands.clear();
        for (int d = 0; d < D; ++d)
          if (row[d] > prune) cands.push_back(d);
        if (cands.size() == 1) {
          int pidx = cands[0];
          if (pidx >= unknown_id) continue;
          double p = row[pidx];
          for (Beam& b : beams) {
            int32_t tail = b.prefix.empty() ? -1 : b.prefix.back();
            if (pidx == 0) {
              b.pb = b.prob() + row[0];
            } else if (pidx != tail) {
              b.lm = ExtendLm(b, pidx);
              b.prefix.push_back(pidx);
              b.pnb = b.prob() + p;
              b.pb = kNegInf;
            } else if (b.pb != kNegInf) {
              b.lm = ExtendLm(b, pidx);
              b.prefix.push_back(pidx);
              b.pnb = b.pb + p;
              b.pb = kNegInf;
            } else {
              double prob = b.prob();
              b.pnb = b.pnb + p;
              b.pb = prob + row[0];
            }
          }
          continue;
        }
        suffix_after(t, &suffix_w);
        SearchStep(&beams, cands, row, suffix_w);
      } else {
        // visual candidates: top search_depth classes by posterior
        cands.resize(D);
        for (int d = 0; d < D; ++d) cands[d] = d;
        int k = std::min(search_depth, D);
        std::partial_sort(cands.begin(), cands.begin() + k, cands.end(),
                          [&](int a, int b) {
                            if (row[a] != row[b]) return row[a] > row[b];
                            return a < b;
                          });
        cands.resize(k);
        suffix_after(t, &suffix_w);
        SearchStep(&beams, cands, row, suffix_w);
      }
    }

    if (beams.empty()) return 0;
    const std::vector<int32_t>& best = beams[0].prefix;
    int n = std::min<int>(static_cast<int>(best.size()), out_cap);
    std::memcpy(out, best.data(), static_cast<size_t>(n) * sizeof(int32_t));
    return n;
  }
};

}  // namespace

extern "C" {

void* cbs_arpa_load(const char* path) {
  auto lm = std::make_unique<ArpaLM>();
  if (!lm->Load(path)) return nullptr;
  return lm.release();
}

void cbs_arpa_free(void* lm) { delete static_cast<ArpaLM*>(lm); }

int cbs_arpa_order(void* lm) { return static_cast<ArpaLM*>(lm)->order(); }

int cbs_arpa_unk_id(void* lm) { return static_cast<ArpaLM*>(lm)->unk_id(); }

int cbs_arpa_word_id(void* lm, const char* utf8) {
  return static_cast<ArpaLM*>(lm)->KnownWordId(utf8);
}

double cbs_arpa_score_ids(void* lm, const int32_t* words, int n, int eos) {
  return static_cast<ArpaLM*>(lm)->Score(words, n, eos != 0);
}

void* cbs_create(void* lm, const int32_t* codec2word, int num_classes,
                 int unknown_id, int beam_size, int search_depth,
                 double lm_panelty, double len_bonus, int use_lm_score,
                 int skip_search, double prune_log_prob, int suffix_len) {
  auto d = std::make_unique<Decoder>();
  d->lm = static_cast<const ArpaLM*>(lm);
  if (codec2word && num_classes > 0)
    d->codec2word.assign(codec2word, codec2word + num_classes);
  d->unknown_id = unknown_id;
  d->beam_size = beam_size;
  d->search_depth = search_depth;
  d->lm_panelty = lm_panelty;
  d->len_bonus = len_bonus;
  d->use_lm_score = use_lm_score != 0;
  d->skip_search = skip_search != 0;
  d->prune = prune_log_prob;
  d->suffix_len = suffix_len;
  return d.release();
}

void cbs_free(void* dec) { delete static_cast<Decoder*>(dec); }

int cbs_decode(void* dec, const float* preds, int T, int D, int already_log,
               int32_t* out, int out_cap) {
  return static_cast<Decoder*>(dec)->Decode(preds, T, D, already_log != 0,
                                            out, out_cap);
}

}  // extern "C"
