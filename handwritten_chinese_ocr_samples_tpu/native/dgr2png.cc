// DGR page extractor + text-line synthesizer (CASIA-HWDB legacy format).
//
// Fresh C++17 re-implementation of the capability of the reference's only
// native component (`utils/casia-hwdb-data-preparation/dgr2png.c`): parse the
// DGR document format from
// http://www.nlpr.ia.ac.cn/databases/handwriting/Offline_database.html,
// reconstruct each text line word-by-word, normalize to height 128, and emit
// per-line PNG images plus GB-code hex label files. In synthesis mode each
// non-alpha/symbol word bitmap is replaced by an isolated HWDB1.x character
// image (labels substituted accordingly), generating unlimited synthetic
// text lines that preserve real page layout.
//
// DGR binary layout (little-endian):
//   header: i32 header_size; char[8] format code ("DGR");
//           char[header_size-36] illustration text; char[20] code type;
//           i16 code length; i16 bits per pixel;
//   doc:    i32 height; i32 width; i32 line_count;
//   line:   i32 word_count; then per word:
//           u8[code_len] label; i16 top; i16 left; i16 height; i16 width;
//           u8[height*width] gray bitmap (255 = background).
//
// CLI contract (kept identical to the reference tool):
//   dgr2png <dgr list file> <output folder>                      # extract
//   dgr2png <dgr list> <out> <hwdb1x img_gt csv> <alpha-symbol hex list>
//                                                                # synthesize
// Outputs: <base>-L<k>[-S<iter>].png + <base>-L<k>[-S<iter>].txt
//
// Build: make -C handwritten_chinese_ocr_samples_tpu/native dgr2png
//   (g++ -std=c++17, OpenCV via pkg-config opencv4)

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <fstream>
#include <iostream>
#include <optional>
#include <sstream>
#include <string>
#include <sys/stat.h>
#include <vector>

#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>

namespace {

constexpr int kTargetHeight = 128;

struct Word {
  std::string hex_label;  // uppercase GB hex, e.g. "B0A1"
  int top = 0, left = 0, height = 0, width = 0;
  std::vector<uint8_t> pixels;  // height*width grayscale
};

struct Line {
  std::vector<Word> words;
};

class BinReader {
 public:
  explicit BinReader(std::istream& in) : in_(in) {}

  template <typename T>
  std::optional<T> scalar() {
    T v;
    in_.read(reinterpret_cast<char*>(&v), sizeof(T));
    if (!in_) return std::nullopt;
    return v;
  }

  bool bytes(void* dst, size_t n) {
    in_.read(reinterpret_cast<char*>(dst), n);
    return static_cast<bool>(in_);
  }

  bool skip(size_t n) {
    in_.ignore(n);
    return static_cast<bool>(in_);
  }

 private:
  std::istream& in_;
};

std::string ToHex(const uint8_t* code, int len) {
  static const char* digits = "0123456789ABCDEF";
  std::string out;
  out.reserve(len * 2);
  for (int i = 0; i < len; ++i) {
    out.push_back(digits[code[i] >> 4]);
    out.push_back(digits[code[i] & 0xF]);
  }
  return out;
}

// Replacement source: a stream of "path,hexcode" lines (HWDB1.x isolated
// character crops) consumed sequentially across all pages.
class SynthSource {
 public:
  SynthSource(const std::string& img_gt_csv,
              const std::string& alpha_symbols_path) {
    gt_.open(img_gt_csv);
    std::ifstream alpha(alpha_symbols_path);
    std::string hex;
    while (std::getline(alpha, hex)) {
      if (!hex.empty() && hex.back() == '\r') hex.pop_back();
      if (!hex.empty()) keep_.push_back(hex);
    }
  }

  bool active() const { return gt_.is_open(); }

  // Alpha/symbol codes are kept as-is (never replaced).
  bool ShouldKeep(const std::string& hex) const {
    return std::find(keep_.begin(), keep_.end(), hex) != keep_.end();
  }

  // Next replacement (image path, label hex); nullopt when exhausted.
  std::optional<std::pair<std::string, std::string>> Next() {
    std::string row;
    if (!std::getline(gt_, row)) return std::nullopt;
    auto comma = row.find(',');
    if (comma == std::string::npos) return std::nullopt;
    std::string rest = row.substr(comma + 1);
    auto comma2 = rest.find(',');
    if (comma2 != std::string::npos) rest = rest.substr(0, comma2);
    return std::make_pair(row.substr(0, comma), rest);
  }

 private:
  std::ifstream gt_;
  std::vector<std::string> keep_;
};

// Parse one DGR file; returns lines of words (with bitmaps), or empty on
// error. `synth` (optional) swaps replaceable word bitmaps+labels.
// Returns false iff the synthesis source ran dry mid-page.
bool ParseDgr(std::istream& in, SynthSource* synth,
              std::vector<Line>& lines) {
  BinReader r(in);
  auto header_size = r.scalar<int32_t>();
  if (!header_size) return true;
  char format[8];
  if (!r.bytes(format, 8)) return true;
  // illustration text occupies header_size - 36 bytes
  if (*header_size < 36 || !r.skip(*header_size - 36)) return true;
  char code_type[20];
  if (!r.bytes(code_type, 20)) return true;
  auto code_len = r.scalar<int16_t>();
  auto bits_pp = r.scalar<int16_t>();
  auto doc_h = r.scalar<int32_t>();
  auto doc_w = r.scalar<int32_t>();
  auto n_lines = r.scalar<int32_t>();
  if (!code_len || !bits_pp || !doc_h || !doc_w || !n_lines) return true;
  if (*code_len <= 0 || *code_len > 8 || *n_lines < 0) return true;

  lines.reserve(*n_lines);
  for (int32_t li = 0; li < *n_lines; ++li) {
    auto n_words = r.scalar<int32_t>();
    if (!n_words || *n_words < 0) return true;
    Line line;
    line.words.reserve(*n_words);
    for (int32_t wi = 0; wi < *n_words; ++wi) {
      Word w;
      std::vector<uint8_t> code(*code_len);
      if (!r.bytes(code.data(), code.size())) return true;
      auto top = r.scalar<int16_t>();
      auto left = r.scalar<int16_t>();
      auto hei = r.scalar<int16_t>();
      auto wid = r.scalar<int16_t>();
      if (!top || !left || !hei || !wid) return true;
      w.top = *top;
      w.left = *left;
      w.height = std::max<int>(0, *hei);
      w.width = std::max<int>(0, *wid);
      w.hex_label = ToHex(code.data(), code.size());
      w.pixels.resize(static_cast<size_t>(w.height) * w.width, 0xFF);
      if (!w.pixels.empty() && !r.bytes(w.pixels.data(), w.pixels.size()))
        return true;

      if (synth && synth->active() && !synth->ShouldKeep(w.hex_label) &&
          w.height > 0 && w.width > 0) {
        auto repl = synth->Next();
        if (!repl) return false;  // source exhausted -> stop synthesis
        cv::Mat glyph = cv::imread(repl->first, cv::IMREAD_GRAYSCALE);
        if (!glyph.empty()) {
          int edge = std::min(w.height, w.width);  // square glyphs compose best
          cv::Mat resized;
          cv::resize(glyph, resized, cv::Size(edge, edge));
          std::fill(w.pixels.begin(), w.pixels.end(), 0xFF);
          for (int y = 0; y < edge; ++y)
            for (int x = 0; x < edge; ++x)
              w.pixels[static_cast<size_t>(y) * w.width + x] =
                  resized.at<uint8_t>(y, x);
          w.hex_label = repl->second;
        }
      }
      line.words.push_back(std::move(w));
    }
    lines.push_back(std::move(line));
  }
  return true;
}

// Compose a line image from its words and normalize to height 128:
// taller lines are resized down; shorter ones are centered vertically on a
// white canvas (same normalization policy as the reference tool).
cv::Mat RenderLine(const Line& line) {
  if (line.words.empty()) return {};
  int top = INT32_MAX, bottom = 0, left = INT32_MAX, right = 0;
  for (const Word& w : line.words) {
    top = std::min(top, w.top);
    bottom = std::max(bottom, w.top + w.height);
    left = std::min(left, std::max(w.left, 0));
    right = std::max(right, w.left + w.width);
  }
  int h = bottom - top, wdt = right - left;
  if (h <= 0 || wdt <= 0) return {};
  cv::Mat canvas(h, wdt, CV_8UC1, cv::Scalar(255));
  for (const Word& w : line.words) {
    for (int y = 0; y < w.height; ++y) {
      int cy = w.top - top + y;
      if (cy < 0 || cy >= h) continue;
      for (int x = 0; x < w.width; ++x) {
        int cx = w.left - left + x;
        if (cx < 0 || cx >= wdt) continue;
        uint8_t px = w.pixels[static_cast<size_t>(y) * w.width + x];
        if (px != 255) canvas.at<uint8_t>(cy, cx) = px;  // ink wins
      }
    }
  }
  if (h > kTargetHeight) {
    cv::Mat out;
    int tw = static_cast<int>(kTargetHeight * (static_cast<float>(wdt) / h));
    cv::resize(canvas, out, cv::Size(std::max(tw, 1), kTargetHeight));
    return out;
  }
  cv::Mat out(kTargetHeight, wdt, CV_8UC1, cv::Scalar(255));
  canvas.copyTo(out(cv::Rect(0, (kTargetHeight - h) / 2, wdt, h)));
  return out;
}

std::string BaseName(const std::string& path) {
  auto slash = path.find_last_of('/');
  std::string name = slash == std::string::npos ? path : path.substr(slash + 1);
  auto dot = name.find_last_of('.');
  return dot == std::string::npos ? name : name.substr(0, dot);
}

bool ProcessFile(const std::string& dgr_path, const std::string& out_dir,
                 SynthSource* synth, const std::string& suffix) {
  std::ifstream in(dgr_path, std::ios::binary);
  if (!in) {
    std::fprintf(stderr, "cannot open %s\n", dgr_path.c_str());
    return true;
  }
  std::vector<Line> lines;
  bool ok = ParseDgr(in, synth, lines);
  std::string base = BaseName(dgr_path);
  for (size_t i = 0; i < lines.size(); ++i) {
    cv::Mat img = RenderLine(lines[i]);
    if (img.empty()) continue;
    std::string stem =
        out_dir + "/" + base + "-L" + std::to_string(i + 1) + suffix;
    cv::imwrite(stem + ".png", img);
    std::ofstream label(stem + ".txt");
    for (const Word& w : lines[i].words) label << w.hex_label << "\n";
  }
  std::printf("%s: %zu lines%s\n", dgr_path.c_str(), lines.size(),
              ok ? "" : " (synthesis source exhausted)");
  return ok;
}

bool PathExists(const std::string& p) {
  struct stat st;
  return stat(p.c_str(), &st) == 0;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc != 3 && argc != 5) {
    std::fprintf(stderr,
                 "USAGE: %s <dgr list file> <output folder>"
                 " [hwdb1x img_gt csv] [alpha-symbol hex list]\n",
                 argv[0]);
    return 1;
  }
  std::string list_path = argv[1];
  std::string out_dir = argv[2];
  if (!PathExists(out_dir)) {
    std::fprintf(stderr, "output folder does not exist: %s\n",
                 out_dir.c_str());
    return 1;
  }

  if (argc == 3) {  // extraction mode
    std::ifstream list(list_path);
    if (!list) {
      std::fprintf(stderr, "cannot open list %s\n", list_path.c_str());
      return 1;
    }
    std::string path;
    while (std::getline(list, path))
      if (!path.empty()) ProcessFile(path, out_dir, nullptr, "");
    return 0;
  }

  // Synthesis mode: loop over the page list until the replacement stream
  // runs dry, emitting a fresh -S<iter> generation per pass.
  SynthSource synth(argv[3], argv[4]);
  if (!synth.active()) {
    std::fprintf(stderr, "cannot open img_gt csv %s\n", argv[3]);
    return 1;
  }
  bool more = true;
  for (int iter = 1; more; ++iter) {
    std::ifstream list(list_path);
    if (!list) {
      std::fprintf(stderr, "cannot open list %s\n", list_path.c_str());
      return 1;
    }
    std::string path;
    std::string suffix = "-S" + std::to_string(iter);
    while (std::getline(list, path)) {
      if (path.empty()) continue;
      if (!ProcessFile(path, out_dir, &synth, suffix)) {
        more = false;
        break;
      }
    }
  }
  return 0;
}
