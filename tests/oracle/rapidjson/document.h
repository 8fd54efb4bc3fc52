/* Syntactic rapidjson stub for compiling the reference data classes as a
 * test oracle. The oracle harness never calls to_json()/save() — map and
 * detection values are read directly and written in a binary format — so
 * these stubs only need to type-check the reference's JSON code, not run
 * it. Every method is a permissive no-op.
 */
#ifndef ORACLE_RAPIDJSON_DOCUMENT_H
#define ORACLE_RAPIDJSON_DOCUMENT_H

#include <cstddef>
#include <string>

namespace rapidjson {

enum Type { kNullType, kFalseType, kTrueType, kObjectType, kArrayType,
            kStringType, kNumberType };

class Value;

class Allocator {
 public:
  /* no state */
};

class Value {
 public:
  Value() {}
  explicit Value(Type) {}
  template <class A> Value(const char *, A &) {}
  template <class T, class A> Value &PushBack(T &&, A &) { return *this; }
  template <class K, class T, class A>
  Value &AddMember(K &&, T &&, A &) { return *this; }
  Value &Move() { return *this; }
  Value &operator[](const char *) { return *this; }
  void Clear() {}
  void SetArray() {}
  void SetObject() {}
  bool IsArray() const { return true; }
  bool Empty() const { return true; }
  std::size_t Size() const { return 0; }
  template <class W> bool Accept(W &) const { return true; }
};

class Document : public Value {
 public:
  typedef Allocator AllocatorType;
  AllocatorType &GetAllocator() { return alloc_; }
  void Parse(const char *) {}
  bool HasParseError() const { return false; }

 private:
  AllocatorType alloc_;
};

}  // namespace rapidjson

#endif
