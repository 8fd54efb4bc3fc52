// Oracle harness: runs the REFERENCE blah2 DSP core (compiled from
// /root/reference/src with the shim headers in this directory) on an
// int16-quad .rspduo file and dumps raw numeric products for
// tests/test_oracle.py to compare against the TPU pipeline.
//
// Flow mirrors the reference CPI loop (`src/blah2.cpp:245-296`):
//   read quads -> IqData x,y -> [WienerHopf] -> Ambiguity -> set_metrics
//   -> CfarDetector1D
//
// Output (all little-endian doubles unless noted):
//   int32 nRows, int32 nCols
//   nRows*nCols complex map values (re, im interleaved, row-major)
//   double noisePower, double maxPower
//   int32 clutterOk
//   int32 nDetections, then nDet*(delay, doppler, snr)
//   int32 nCentroided, then n*(delay, doppler, snr)      [Centroid output]
//   int32 nInterpolated, then n*(delay, doppler, snr)    [Interpolate output]
//
// Usage: harness <in.rspduo> <out.bin> <fs> <cpi_s> <delayMin> <delayMax>
//        <dopplerMin> <dopplerMax> <clutterEnable> <clutterDelayMin>
//        <clutterDelayMax> <pfa> <nGuard> <nTrain> <minDelay> <minDoppler>
//        [nCentroid]

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <complex>
#include <memory>
#include <string>
#include <vector>

#include "data/IqData.h"
#include "data/Map.h"
#include "data/Detection.h"
#include "process/ambiguity/Ambiguity.h"
#include "process/clutter/WienerHopf.h"
#include "process/detection/CfarDetector1D.h"
#include "process/detection/Centroid.h"
#include "process/detection/Interpolate.h"

static void write_detections(FILE *out, Detection *det) {
  std::vector<double> dd = det->get_delay();
  std::vector<double> df = det->get_doppler();
  std::vector<double> ds = det->get_snr();
  const int32_t n_det = (int32_t)dd.size();
  std::fwrite(&n_det, sizeof(int32_t), 1, out);
  for (int32_t k = 0; k < n_det; k++) {
    std::fwrite(&dd[(size_t)k], sizeof(double), 1, out);
    std::fwrite(&df[(size_t)k], sizeof(double), 1, out);
    std::fwrite(&ds[(size_t)k], sizeof(double), 1, out);
  }
}

int main(int argc, char **argv) {
  if (argc != 17 && argc != 18) {
    std::fprintf(stderr, "usage: see header\n");
    return 2;
  }
  const std::string in_path = argv[1];
  const std::string out_path = argv[2];
  const uint32_t fs = (uint32_t)std::atol(argv[3]);
  const double cpi_s = std::atof(argv[4]);
  const int delay_min = std::atoi(argv[5]);
  const int delay_max = std::atoi(argv[6]);
  const int doppler_min = std::atoi(argv[7]);
  const int doppler_max = std::atoi(argv[8]);
  const int clutter_enable = std::atoi(argv[9]);
  const int clutter_dmin = std::atoi(argv[10]);
  const int clutter_dmax = std::atoi(argv[11]);
  const double pfa = std::atof(argv[12]);
  const int n_guard = std::atoi(argv[13]);
  const int n_train = std::atoi(argv[14]);
  const int min_delay = std::atoi(argv[15]);
  const double min_doppler = std::atof(argv[16]);
  const int n_centroid = (argc == 18) ? std::atoi(argv[17]) : 6;

  const uint32_t n_samples = (uint32_t)((double)fs * cpi_s);

  IqData x(n_samples), y(n_samples);
  FILE *fp = std::fopen(in_path.c_str(), "rb");
  if (!fp) { std::perror("open input"); return 1; }
  int16_t q[4];
  while (x.get_length() < n_samples &&
         std::fread(q, sizeof(int16_t), 4, fp) == 4) {
    x.push_back({(double)q[0], (double)q[1]});
    y.push_back({(double)q[2], (double)q[3]});
  }
  std::fclose(fp);
  if (x.get_length() < n_samples) {
    std::fprintf(stderr, "short file: %u < %u\n", x.get_length(), n_samples);
    return 1;
  }

  int clutter_ok = 1;
  if (clutter_enable) {
    WienerHopf filter(clutter_dmin, clutter_dmax, n_samples);
    clutter_ok = filter.process(&x, &y) ? 1 : 0;
  }

  Ambiguity ambiguity(delay_min, delay_max, doppler_min, doppler_max, fs,
                      n_samples, true);
  Map<std::complex<double>> *map = ambiguity.process(&x, &y);
  map->set_metrics();

  CfarDetector1D cfar(pfa, (int8_t)n_guard, (int8_t)n_train,
                      (int8_t)min_delay, min_doppler);
  std::unique_ptr<Detection> det = cfar.process(map);

  FILE *out = std::fopen(out_path.c_str(), "wb");
  if (!out) { std::perror("open output"); return 1; }
  const int32_t n_rows = (int32_t)map->get_nRows();
  const int32_t n_cols = (int32_t)map->get_nCols();
  std::fwrite(&n_rows, sizeof(int32_t), 1, out);
  std::fwrite(&n_cols, sizeof(int32_t), 1, out);
  for (int32_t i = 0; i < n_rows; i++) {
    std::vector<std::complex<double>> row = map->get_row((uint32_t)i);
    for (int32_t j = 0; j < n_cols; j++) {
      double re = row[(size_t)j].real(), im = row[(size_t)j].imag();
      std::fwrite(&re, sizeof(double), 1, out);
      std::fwrite(&im, sizeof(double), 1, out);
    }
  }
  std::fwrite(&map->noisePower, sizeof(double), 1, out);
  std::fwrite(&map->maxPower, sizeof(double), 1, out);
  const int32_t ok32 = clutter_ok;
  std::fwrite(&ok32, sizeof(int32_t), 1, out);
  write_detections(out, det.get());

  // Detection tail: Centroid + Interpolate exactly as the reference app
  // wires them (`src/blah2.cpp:178-183`: Interpolate(true, true),
  // Centroid(nCentroid, nCentroid, 1/tCpi)).
  Centroid centroid((uint16_t)n_centroid, (uint16_t)n_centroid,
                    1.0 / cpi_s);
  std::unique_ptr<Detection> cent = centroid.process(det.get());
  write_detections(out, cent.get());
  Interpolate interpolate(true, true);
  std::unique_ptr<Detection> interp = interpolate.process(cent.get(), map);
  write_detections(out, interp.get());
  std::fclose(out);

  std::printf("oracle: map %dx%d noise %.6f max %.6f clutter_ok %d "
              "ndet %zu cent %zu interp %zu\n",
              n_rows, n_cols, map->noisePower, map->maxPower, clutter_ok,
              det->get_delay().size(), cent->get_delay().size(),
              interp->get_delay().size());
  return 0;
}
