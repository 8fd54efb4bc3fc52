/* See document.h: syntactic stub only. */
#ifndef ORACLE_RAPIDJSON_WRITER_H
#define ORACLE_RAPIDJSON_WRITER_H
namespace rapidjson {
template <class Stream> class Writer {
 public:
  explicit Writer(Stream &) {}
  void SetMaxDecimalPlaces(int) {}
};
}  // namespace rapidjson
#endif
