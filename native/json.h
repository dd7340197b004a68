// Minimal JSON parser for the glTF loader. Supports the full JSON grammar
// (objects, arrays, strings w/ escapes, numbers, bools, null); no writer.
#pragma once
#include <cstdint>
#include <cstdlib>
#include <map>
#include <memory>
#include <string>
#include <vector>

namespace wrt {
namespace json {

class Value;
using Array = std::vector<Value>;
using Object = std::map<std::string, Value>;

class Value {
 public:
  enum class Type { Null, Bool, Number, String, Array, Object };

  Value() : type_(Type::Null) {}
  explicit Value(bool b) : type_(Type::Bool), bool_(b) {}
  explicit Value(double d) : type_(Type::Number), num_(d) {}
  explicit Value(std::string s) : type_(Type::String), str_(std::move(s)) {}

  Type type() const { return type_; }
  bool is_null() const { return type_ == Type::Null; }
  bool is_object() const { return type_ == Type::Object; }
  bool is_array() const { return type_ == Type::Array; }
  bool is_number() const { return type_ == Type::Number; }
  bool is_string() const { return type_ == Type::String; }

  double num(double dflt = 0.0) const { return is_number() ? num_ : dflt; }
  int64_t as_int(int64_t dflt = 0) const {
    return is_number() ? (int64_t)num_ : dflt;
  }
  const std::string& str() const { return str_; }
  bool boolean(bool dflt = false) const {
    return type_ == Type::Bool ? bool_ : dflt;
  }

  const Array& arr() const {
    static const Array empty;
    return arr_ ? *arr_ : empty;
  }
  const Object& obj() const {
    static const Object empty;
    return obj_ ? *obj_ : empty;
  }

  // Lookup helpers returning Null on absence.
  const Value& operator[](const std::string& key) const {
    static const Value null;
    if (!obj_) return null;
    auto it = obj_->find(key);
    return it == obj_->end() ? null : it->second;
  }
  const Value& operator[](size_t i) const {
    static const Value null;
    if (!arr_ || i >= arr_->size()) return null;
    return (*arr_)[i];
  }
  size_t size() const { return arr_ ? arr_->size() : 0; }
  bool has(const std::string& key) const {
    return obj_ && obj_->count(key) > 0;
  }

  static Value make_array() {
    Value v;
    v.type_ = Type::Array;
    v.arr_ = std::make_shared<Array>();
    return v;
  }
  static Value make_object() {
    Value v;
    v.type_ = Type::Object;
    v.obj_ = std::make_shared<Object>();
    return v;
  }
  Array* mutable_arr() { return arr_.get(); }
  Object* mutable_obj() { return obj_.get(); }

 private:
  Type type_;
  bool bool_ = false;
  double num_ = 0.0;
  std::string str_;
  std::shared_ptr<Array> arr_;
  std::shared_ptr<Object> obj_;
};

// Parses a JSON document; returns Null value on error (sets *ok = false).
Value parse(const char* data, size_t len, bool* ok);

}  // namespace json
}  // namespace wrt
