#include "json.h"

#include <cmath>
#include <cstring>

namespace wrt {
namespace json {
namespace {

struct Parser {
  const char* p;
  const char* end;
  bool ok = true;

  void skip_ws() {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r'))
      ++p;
  }

  bool consume(char c) {
    skip_ws();
    if (p < end && *p == c) {
      ++p;
      return true;
    }
    return false;
  }

  Value parse_value() {
    skip_ws();
    if (p >= end) {
      ok = false;
      return Value();
    }
    switch (*p) {
      case '{': return parse_object();
      case '[': return parse_array();
      case '"': return Value(parse_string());
      case 't':
        if (end - p >= 4 && !std::strncmp(p, "true", 4)) {
          p += 4;
          return Value(true);
        }
        ok = false;
        return Value();
      case 'f':
        if (end - p >= 5 && !std::strncmp(p, "false", 5)) {
          p += 5;
          return Value(false);
        }
        ok = false;
        return Value();
      case 'n':
        if (end - p >= 4 && !std::strncmp(p, "null", 4)) {
          p += 4;
          return Value();
        }
        ok = false;
        return Value();
      default: return parse_number();
    }
  }

  Value parse_number() {
    char* num_end = nullptr;
    double d = std::strtod(p, &num_end);
    if (num_end == p) {
      ok = false;
      return Value();
    }
    p = num_end;
    return Value(d);
  }

  std::string parse_string() {
    std::string out;
    if (p >= end || *p != '"') {
      ok = false;
      return out;
    }
    ++p;
    while (p < end && *p != '"') {
      char c = *p++;
      if (c == '\\' && p < end) {
        char e = *p++;
        switch (e) {
          case '"': out += '"'; break;
          case '\\': out += '\\'; break;
          case '/': out += '/'; break;
          case 'b': out += '\b'; break;
          case 'f': out += '\f'; break;
          case 'n': out += '\n'; break;
          case 'r': out += '\r'; break;
          case 't': out += '\t'; break;
          case 'u': {
            if (end - p < 4) {
              ok = false;
              return out;
            }
            unsigned cp = 0;
            for (int i = 0; i < 4; ++i) {
              char h = p[i];
              cp <<= 4;
              if (h >= '0' && h <= '9') cp |= h - '0';
              else if (h >= 'a' && h <= 'f') cp |= h - 'a' + 10;
              else if (h >= 'A' && h <= 'F') cp |= h - 'A' + 10;
              else { ok = false; return out; }
            }
            p += 4;
            // UTF-8 encode (BMP only; surrogate pairs rare in glTF names)
            if (cp < 0x80) {
              out += (char)cp;
            } else if (cp < 0x800) {
              out += (char)(0xC0 | (cp >> 6));
              out += (char)(0x80 | (cp & 0x3F));
            } else {
              out += (char)(0xE0 | (cp >> 12));
              out += (char)(0x80 | ((cp >> 6) & 0x3F));
              out += (char)(0x80 | (cp & 0x3F));
            }
            break;
          }
          default: ok = false; return out;
        }
      } else {
        out += c;
      }
    }
    if (p >= end) {
      ok = false;
      return out;
    }
    ++p;  // closing quote
    return out;
  }

  Value parse_array() {
    Value v = Value::make_array();
    ++p;  // '['
    skip_ws();
    if (p < end && *p == ']') {
      ++p;
      return v;
    }
    while (ok) {
      v.mutable_arr()->push_back(parse_value());
      skip_ws();
      if (consume(',')) continue;
      if (consume(']')) break;
      ok = false;
    }
    return v;
  }

  Value parse_object() {
    Value v = Value::make_object();
    ++p;  // '{'
    skip_ws();
    if (p < end && *p == '}') {
      ++p;
      return v;
    }
    while (ok) {
      skip_ws();
      std::string key = parse_string();
      if (!ok || !consume(':')) {
        ok = false;
        break;
      }
      (*v.mutable_obj())[key] = parse_value();
      skip_ws();
      if (consume(',')) continue;
      if (consume('}')) break;
      ok = false;
    }
    return v;
  }
};

}  // namespace

Value parse(const char* data, size_t len, bool* ok) {
  Parser parser{data, data + len};
  Value v = parser.parse_value();
  if (ok) *ok = parser.ok;
  return parser.ok ? v : Value();
}

}  // namespace json
}  // namespace wrt
