/* See document.h: syntactic stub only. */
#ifndef ORACLE_RAPIDJSON_STRINGBUFFER_H
#define ORACLE_RAPIDJSON_STRINGBUFFER_H
namespace rapidjson {
class StringBuffer {
 public:
  const char *GetString() const { return ""; }
  unsigned long GetSize() const { return 0; }
};
}  // namespace rapidjson
#endif
