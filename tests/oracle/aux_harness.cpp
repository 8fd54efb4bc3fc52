// Aux oracle harness: drives the REFERENCE Centroid and Tracker (compiled
// unmodified from /root/reference/src) on crafted detection inputs, so
// tests/test_oracle.py can pin behaviors the RF-scene harness cannot reach
// deterministically — the Centroid uint16-wrap zone and full track life
// cycles (initiate / associate / promote / coast / delete).
//
// Modes (stdin -> stdout, whitespace-separated text):
//
//   aux_harness centroid <nDelay> <nDoppler> <resolutionDoppler>
//     stdin:  one detection per line: <delay> <doppler> <snr>
//     stdout: kept detections, one per line: <delay> <doppler> <snr>
//
//   aux_harness track <m> <n> <nDelete> <cpi> <maxAcc> <rangeRes> <lambda>
//     stdin:  per CPI: "T <timestamp_ms>", then zero or more
//             "D <delay> <doppler> <snr>", then "E"
//     stdout: after each CPI: "N <nTracks>" then one line per track:
//             "K <state> <delay> <doppler> <acc> <nInactive>"
//
// Reference call flow matches `src/blah2.cpp:183,195,291-296`.

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <iostream>
#include <memory>
#include <sstream>
#include <string>
#include <vector>

#include "data/Detection.h"
#include "data/Track.h"
#include "process/detection/Centroid.h"
#include "process/tracker/Tracker.h"

static int run_centroid(int argc, char **argv) {
  if (argc != 5) return 2;
  Centroid centroid((uint16_t)std::atoi(argv[2]),
                    (uint16_t)std::atoi(argv[3]), std::atof(argv[4]));
  std::vector<double> delay, doppler, snr;
  double d, f, s;
  while (std::cin >> d >> f >> s) {
    delay.push_back(d);
    doppler.push_back(f);
    snr.push_back(s);
  }
  Detection det(delay, doppler, snr);
  std::unique_ptr<Detection> kept = centroid.process(&det);
  std::vector<double> kd = kept->get_delay();
  std::vector<double> kf = kept->get_doppler();
  std::vector<double> ks = kept->get_snr();
  for (size_t i = 0; i < kd.size(); i++)
    std::printf("%.17g %.17g %.17g\n", kd[i], kf[i], ks[i]);
  return 0;
}

static int run_track(int argc, char **argv) {
  if (argc != 9) return 2;
  Tracker tracker((uint32_t)std::atoi(argv[2]), (uint32_t)std::atoi(argv[3]),
                  (uint32_t)std::atoi(argv[4]), std::atof(argv[5]),
                  std::atof(argv[6]), std::atof(argv[7]),
                  std::atof(argv[8]));
  std::string tok;
  uint64_t ts = 0;
  std::vector<double> delay, doppler, snr;
  while (std::cin >> tok) {
    if (tok == "T") {
      std::cin >> ts;
      delay.clear(); doppler.clear(); snr.clear();
    } else if (tok == "D") {
      double d, f, s;
      std::cin >> d >> f >> s;
      delay.push_back(d); doppler.push_back(f); snr.push_back(s);
    } else if (tok == "E") {
      Detection det(delay, doppler, snr);
      std::unique_ptr<Track> track = tracker.process(&det, ts);
      uint64_t n = track->get_n();
      std::printf("N %llu\n", (unsigned long long)n);
      for (uint64_t i = 0; i < n; i++) {
        Detection cur = track->get_current(i);
        std::printf("K %s %.17g %.17g %.17g %llu\n",
                    track->get_state(i).c_str(),
                    cur.get_delay().front(), cur.get_doppler().front(),
                    track->get_acceleration(i),
                    (unsigned long long)track->get_nInactive(i));
      }
      std::fflush(stdout);
    }
  }
  return 0;
}

int main(int argc, char **argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: see header\n");
    return 2;
  }
  if (std::strcmp(argv[1], "centroid") == 0) return run_centroid(argc, argv);
  if (std::strcmp(argv[1], "track") == 0) return run_track(argc, argv);
  std::fprintf(stderr, "unknown mode %s\n", argv[1]);
  return 2;
}
