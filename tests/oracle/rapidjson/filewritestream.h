/* See document.h: syntactic stub only. */
#ifndef ORACLE_RAPIDJSON_FILEWRITESTREAM_H
#define ORACLE_RAPIDJSON_FILEWRITESTREAM_H
#include <cstdio>
namespace rapidjson {
class FileWriteStream {
 public:
  FileWriteStream(std::FILE *, char *, unsigned long) {}
};
}  // namespace rapidjson
#endif
